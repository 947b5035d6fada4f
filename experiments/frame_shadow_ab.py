"""Frame-level A/B: sort occlusion waves in their own Morton order?

The shadow-split trace (artifacts/r5_device5/arch_trace2.log) prices the
occlusion waves at 546 ms of the 1080p frame (93.7/175.9/276.7 by
bounce) — they run in the CONTINUATION rays' sorted order, one scatter
step stale relative to their own origins. LOUPIOTE_SHADOW_SORT=B sorts
every occlusion wave from bounce B on by its own origin-Morton+octant
key (ops/shade.py::_occluded_sorted: one packed gather + bool scatter;
bit-identical frames, tests/test_render.py). The sort overhead is ~1
argsort + ~2 gather passes per wave, so only the expensive late-bounce
waves can plausibly pay.

Usage: python experiments/frame_shadow_ab.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1920, 1080
VARIANTS = {
    "base": {},
    "sb2": {"LOUPIOTE_SHADOW_SORT": "2"},
    "sb1": {"LOUPIOTE_SHADOW_SORT": "1"},
    "sb0": {"LOUPIOTE_SHADOW_SORT": "0"},
}


def run_one(name):
    os.environ.update(VARIANTS[name])
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    bufs = build_scene_buffers(build_arch_scene(260_000))
    cam = jnp.asarray(np.asarray(arch_camera()))
    fn = jax.jit(lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT, k,
                                          bounces=3)[0])
    t0 = time.time()
    out = jax.block_until_ready(fn(bufs, jr.PRNGKey(1)))
    compile_s = time.time() - t0
    nz = float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean())
    best = float("inf")
    for i in range(5):
        for attempt in range(3):
            try:
                t0 = time.time()
                jax.block_until_ready(fn(bufs, jr.PRNGKey(10 + 7 * i)))
                best = min(best, time.time() - t0)
                break
            except Exception as e:
                print(f"  {name} flake: {repr(e)[:80]}", flush=True)
                time.sleep(5)
    print(json.dumps({"name": name, "ms": round(best * 1e3, 1),
                      "compile_s": round(compile_s, 1),
                      "nonzero": round(nz, 3)}), flush=True)


def main():
    best = {}
    here = os.path.abspath(__file__)
    for name in VARIANTS:
        try:
            p = subprocess.run([sys.executable, here, "--one", name],
                               capture_output=True, text=True, timeout=2700)
        except subprocess.TimeoutExpired:
            print(f"{name}: FAILED(timeout)", flush=True)
            continue
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            err = (p.stderr.strip().splitlines() or [""])[-1][:160]
            print(f"{name}: FAILED rc={p.returncode} {err}", flush=True)
            continue
        rec = json.loads(line[-1])
        best[name] = rec["ms"]
        print(f"FRAME {name:>5}: {rec['ms']:7.1f} ms "
              f"(compile {rec['compile_s']}s, nonzero {rec['nonzero']})",
              flush=True)
    if "base" in best:
        for name in ("sb2", "sb1", "sb0"):
            if name in best:
                print(f"{name} saves {best['base'] - best[name]:+.1f} ms",
                      flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
