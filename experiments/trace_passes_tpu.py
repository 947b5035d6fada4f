"""Validate trace-based per-pass timing on the real TPU (VERDICT r4 #6).

Drives Renderer.measure_passes on the Cornell interactive frame and
reports which method ran ("trace" = measured fused-kernel device times
parsed from a jax.profiler XSpace; "replay" = the rescaled unfused
fallback), plus the per-pass table and its sum vs the fused frame time.

PASS criterion: method == "trace", every expected label present, and the
labeled sum within [50%, 120%] of "frame (fused)" (the device plane also
contains tunnel idle gaps; the labels need to cover the bulk of real
kernel time, not wall time).

Usage: python experiments/trace_passes_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    print("devices:", jax.devices(), flush=True)

    from loupiote_tpu.app.driver import Driver
    from loupiote_tpu.config import BlitMode

    driver = Driver((256, 256))
    driver.load_gltf_path("/root/reference/assets/cornell-box.glb")
    driver.load_blue_noise()
    driver.upload_scene()
    driver.settings.blit_mode = BlitMode.DENOISED_PATHTRACE
    driver.step(0.016)  # compile + one real frame
    out = driver.measure_passes()
    method = out.pop("method", "?")
    print(f"method: {method}", flush=True)
    fused = out.get("frame (fused)", 0.0)
    labeled = {k: v for k, v in out.items()
               if k not in ("frame (fused)", "unfused total", "other")}
    for k, v in out.items():
        print(f"  {k:24s} {v:8.2f} ms", flush=True)
    ssum = sum(labeled.values())
    print(f"labeled sum {ssum:.2f} ms vs fused {fused:.2f} ms "
          f"({100 * ssum / max(fused, 1e-9):.0f}%)", flush=True)
    expected = {"ray generation", "primary intersection", "shading 0",
                "intersection 1", "shading 1", "asvgf"}
    missing = expected - set(out)
    ok = (method == "trace" and not missing
          and 0.5 * fused <= ssum <= 1.2 * fused)
    print("MISSING:", sorted(missing), flush=True)
    print("TRACE_PASSES", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
