"""Full-frame A/B: per-bounce regroup via XLA argsort+gathers (default)
vs the slab-local Pallas payload sort (LOUPIOTE_SLAB_SORT=1).

The slab sort (ops/slab_sort.py) replaces the global argsort + per-field
HBM gathers with ONE kernel dispatch that compare-swaps 64k-ray slabs in
VMEM with the entire bounce state riding as payload. Sim says packet
coherence matches the global sort (experiments/slab_sort_sim.py);
primitive timing says 10.6 vs 17.7 ns/elem (round-4 device window).
This measures what that buys END TO END on the headline frame —
the number that decides whether slab mode becomes the default.

The env is read at trace time, so both variants trace in one process
(separate jit wrappers), timed interleaved same-window.

Usage: python experiments/frame_sort_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1920, 1080


def main():
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

    fns = {}
    for name, env in (("argsort", "0"), ("slab", "1")):
        os.environ["LOUPIOTE_SLAB_SORT"] = env
        fns[name] = jax.jit(
            lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT, k, bounces=3)[0])
        t0 = time.time()
        out = jax.block_until_ready(fns[name](bufs, jr.PRNGKey(1)))
        nz = float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean())
        print(f"compiled {name}: {time.time()-t0:.1f}s "
              f"(nonzero {nz*100:.1f}%)", flush=True)
    os.environ.pop("LOUPIOTE_SLAB_SORT", None)

    best = {n: float("inf") for n in fns}
    for i in range(6):
        for name, fn in fns.items():
            for attempt in range(3):  # tunnel re-execute flakes
                try:
                    t0 = time.time()
                    jax.block_until_ready(fn(bufs, jr.PRNGKey(10 + 7 * i)))
                    best[name] = min(best[name], time.time() - t0)
                    break
                except Exception as e:
                    print(f"  {name} flake: {repr(e)[:80]}", flush=True)
                    time.sleep(5)
        print(f"round {i}: " + " ".join(f"{n}={best[n]*1e3:.0f}ms"
                                        for n in fns), flush=True)
    for name in fns:
        print(f"FRAME {name:>8}: {best[name]*1e3:7.1f} ms", flush=True)
    print(f"slab saves {(best['argsort']-best['slab'])*1e3:+.1f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
