"""Measured per-pass attribution of the HEADLINE frame (1080p arch-260k,
3 bounces, NEE) from one fused-frame profiler trace — the real version
of the round-4 'where does the frame go' question (frame_parts.py was
ablation-based; this is measured from the trace the user's frame runs).

Prints per-label device ms and shares of the fused frame.

Usage: python experiments/arch_trace_attrib.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

WIDTH, HEIGHT, BOUNCES = 1920, 1080, 3


def main():
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.app.trace_parse import (frame_scope_labels,
                                              measure_fused_passes)
    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    print("devices:", jax.devices(), flush=True)
    bufs = build_scene_buffers(build_arch_scene(260_000))
    cam = jnp.asarray(np.asarray(arch_camera()))
    fj = jax.jit(lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT, k,
                                          bounces=BOUNCES)[0])
    calls = [0]

    def frame():
        calls[0] += 1  # fresh key: the backend dedupes repeat executions
        return fj(bufs, jr.PRNGKey(100 + calls[0]))

    t0 = time.time()
    jax.block_until_ready(frame())
    print(f"compile: {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(frame())
        best = min(best, time.time() - t0)
    fused_ms = best * 1e3
    print(f"fused frame: {fused_ms:.1f} ms", flush=True)

    labels = frame_scope_labels(BOUNCES)
    out = measure_fused_passes(frame, labels)
    if out is None:
        print("TRACE UNAVAILABLE", flush=True)
        return
    total = sum(out.values())
    print(f"{'label':24s} {'ms':>9s} {'share':>7s}", flush=True)
    for k, v in out.items():
        print(f"{k:24s} {v:9.1f} {100 * v / max(total, 1e-9):6.1f}%",
              flush=True)
    print(f"{'TOTAL(traced)':24s} {total:9.1f}  (fused wall {fused_ms:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
