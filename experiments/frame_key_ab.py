"""Full-frame A/B of the inter-bounce ray sort KEY (LOUPIOTE_SORT_KEY).

ops/sort.py offers two layouts: oct_m9 (direction octant major — the
shipped default) and coarse<N> (top-N Morton bits major, then octant).
Host replays say coarse keys cut steps/packet (coarse9: 108.5 vs 142.8,
-24%, sortkey_sim.py), but the round-4 PAIRED device replay put coarse6
at only ~0.91x — and sim step counts have already been caught not
predicting device time once (w16/leaf-rows, ROADMAP round-4). This is
the frame-level number that decides the default.

Each variant runs in its OWN subprocess (the env var is read at trace
time, and two frame-sized Pallas executables wedge the tunnel when they
share a process — frame_sort_ab.py round-5 finding), interleave-proof:
same window, best-of-5 each.

Usage: python experiments/frame_key_ab.py                (parent, all)
       python experiments/frame_key_ab.py --one coarse9  (child)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1920, 1080
KEYS = ("oct_m9", "coarse9", "coarse6")


def run_one(name):
    os.environ["LOUPIOTE_SORT_KEY"] = name
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
        for attempt in range(3):  # transient re-execute flakes
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
    for name in KEYS:
        try:
            p = subprocess.run([sys.executable, here, "--one", name],
                               capture_output=True, text=True, timeout=2700)
        except subprocess.TimeoutExpired:
            print(f"{name}: FAILED(timeout 2700s)", flush=True)
            continue
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            err = (p.stderr.strip().splitlines()[-1][:160]
                   if p.stderr.strip() else "")
            print(f"{name}: FAILED rc={p.returncode} {err}", flush=True)
            continue
        rec = json.loads(line[-1])
        best[name] = rec["ms"]
        print(f"FRAME {name:>8}: {rec['ms']:7.1f} ms "
              f"(compile {rec['compile_s']}s, nonzero {rec['nonzero']})",
              flush=True)
    if "oct_m9" in best:
        for name in KEYS[1:]:
            if name in best:
                print(f"{name} saves {best['oct_m9'] - best[name]:+.1f} "
                      f"ms/frame vs oct_m9", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
