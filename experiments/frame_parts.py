"""Attribute the full-frame time beyond the traversal kernels.

BENCH r3: frame 1578 ms, kernels 1165 ms -> 413 ms of sort glue +
shading + raygen + gbuffer. This times frame variants that toggle one
ingredient each, same-window interleaved:

  full        bounces=3, NEE, sorted     (the headline frame)
  nosort      sort_rays=False            -> sort glue cost
  nonee       nee=False                  -> NEE shadow waves + light math
  b1 / b2     bounces=1 / 2              -> per-bounce increments

Usage: python experiments/frame_parts.py
"""

import functools
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

    CFGS = [("full", dict(bounces=3, nee=True, sort_rays=True)),
            ("nosort", dict(bounces=3, nee=True, sort_rays=False)),
            ("nonee", dict(bounces=3, nee=False, sort_rays=True)),
            ("b2", dict(bounces=2, nee=True, sort_rays=True)),
            ("b1", dict(bounces=1, nee=True, sort_rays=True))]

    fns = {}
    for name, kw in CFGS:
        fns[name] = jax.jit(functools.partial(
            lambda b, k, kw: trace_paths(b, cam, WIDTH, HEIGHT, k,
                                         **kw)[0], kw=kw))
        t0 = time.time()
        jax.block_until_ready(fns[name](bufs, jr.PRNGKey(1)))
        print(f"compiled {name}: {time.time()-t0:.1f}s", flush=True)

    best = {n: float("inf") for n, _ in CFGS}
    for i in range(5):
        for name, _ in CFGS:
            # The tunneled backend sporadically returns INVALID_ARGUMENT on
            # a re-execute (transient; the same program ran fine during
            # compile). Fail-soft per call so one flake can't void the run.
            for attempt in range(3):
                try:
                    t0 = time.time()
                    out = fns[name](bufs, jr.PRNGKey(10 + 7 * i + attempt))
                    jax.block_until_ready(out)
                    best[name] = min(best[name], time.time() - t0)
                    break
                except Exception as e:
                    print(f"  {name} i={i} flake: {repr(e)[:90]}",
                          flush=True)
                    time.sleep(5)
        print(f"round {i}: " + " ".join(
            f"{n}={best[n]*1e3:.0f}ms" for n, _ in CFGS), flush=True)
    for name, _ in CFGS:
        print(f"{name:>7}: {best[name]*1e3:7.1f} ms", flush=True)
    print(f"sort glue  = full - nosort = "
          f"{(best['nosort']-best['full'])*-1e3:+.1f} ms", flush=True)
    print(f"NEE total  = full - nonee  = "
          f"{(best['full']-best['nonee'])*1e3:+.1f} ms", flush=True)


if __name__ == "__main__":
    main()
