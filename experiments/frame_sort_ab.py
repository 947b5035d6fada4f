"""[SETTLED round 5 — kept as the record] Full-frame A/B: per-bounce
regroup via XLA argsort+gathers (default) vs the slab-local Pallas
payload sort (LOUPIOTE_SLAB_SORT=1).

RESULT (artifacts/r5_device1/frame_sort_ab3.log): slab LOST at frame
level — 2010.1 ms vs 1911.7 ms argsort (nonzero parity 0.960/0.962),
compile 1495.6 s vs 240.2 s — despite winning primitive timings
(10.6 vs 17.7 ns/elem). The integrator's LOUPIOTE_SLAB_SORT branch was
removed after this measurement (render/integrator.py documents it), so
re-running this script now measures argsort twice.

The slab sort (ops/slab_sort.py) replaces the global argsort + per-field
HBM gathers with ONE kernel dispatch that compare-swaps 64k-ray slabs in
VMEM with the entire bounce state riding as payload. Sim says packet
coherence matches the global sort (experiments/slab_sort_sim.py);
primitive timing says 10.6 vs 17.7 ns/elem (round-4 device window).
This measures what that buys END TO END on the headline frame —
the number that decides whether slab mode becomes the default.

Round-5 finding (artifacts/r5_device1/frame_sort_ab2.log): the two
frame-sized Pallas executables CANNOT share one process — after the
second loads, every re-execute throws INVALID_ARGUMENT (the same tunnel
wedge bench.py documents). Each variant therefore runs in its OWN
subprocess, same window, best-of-N; the parent prints the delta. The
child compile times double as the cross-process persistent-cache probe
(ROADMAP round-5 queue #3).

Usage: python experiments/frame_sort_ab.py           (parent, both)
       python experiments/frame_sort_ab.py --one slab (child)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1920, 1080


def run_one(name):
    os.environ["LOUPIOTE_SLAB_SORT"] = "1" if name == "slab" else "0"
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
    for name in ("argsort", "slab"):
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
    if len(best) == 2:
        print(f"slab saves {best['argsort'] - best['slab']:+.1f} ms/frame",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
