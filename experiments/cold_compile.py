"""True cold-compile time of the headline frame jit per kernel config.

Each invocation uses a FRESH persistent-cache dir (so nothing is warm)
and compiles the full 1080p 3-bounce NEE frame once. Run one config per
process:

  python experiments/cold_compile.py <sub> <unroll:1|2> [tag]
"""

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sub, unroll, tag="x"):
    cache = f"/tmp/coldcache_{sub}_{unroll}_{tag}"
    shutil.rmtree(cache, ignore_errors=True)
    os.environ["LOUPIOTE_WIDE_SUB"] = str(sub)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.random as jr

    import loupiote_tpu.ops.pallas_wide as pw

    if unroll == 1:
        # Force unroll1 by defaulting the ablate token through the env is
        # not wired; patch the module default instead (process-local).
        orig = pw._wide_trace

        def patched(*a, **kw):
            kw["ablate"] = (kw.get("ablate") or "") + ",unroll1"
            return orig(*a, **kw)

        pw._wide_trace = patched
    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    bufs = build_scene_buffers(build_arch_scene(260_000))
    cam = jnp.asarray(np.asarray(arch_camera()))
    frame = jax.jit(lambda b, k: trace_paths(b, cam, 1920, 1080, k,
                                             bounces=3)[0])
    t0 = time.time()
    out = frame(bufs, jr.PRNGKey(3))
    jax.block_until_ready(out)
    np.asarray(out[:4])
    print(f"COLD sub={sub} unroll={unroll}: {time.time()-t0:.1f} s",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]),
         sys.argv[3] if len(sys.argv) > 3 else "x")
