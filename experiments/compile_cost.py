"""Mosaic compile time of the wide kernel vs (sub, unroll) config.

The round-3 sub=64 default lifted wave throughput 35% but the unrolled
per-row fetch loops scale the program with sub: the full-frame cold
compile hit 903 s (bench r3). This measures kernel-alone compile times
so the default can trade runtime against time-to-first-frame. max_steps
is nudged per run to force a fresh cache key.

Usage: python experiments/compile_cost.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_wide import SUBP, _wide_trace
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    bufs = build_scene_buffers(build_arch_scene(260_000))
    R = 64 * 8 * SUBP
    rng = np.random.default_rng(0)
    ro = rng.uniform(-5, 5, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    nudge = int(time.time()) % 1000  # fresh cache key per invocation

    for sub, ab in [(8, ""), (16, ""), (32, ""), (32, "unroll1"),
                    (64, ""), (64, "unroll1")]:
        G = R // (sub * SUBP)

        def shape(x):
            return jnp.asarray(x.reshape(G, sub, SUBP))

        args = ([bufs.trav_rows] + [shape(ro[:, i]) for i in range(3)]
                + [shape(rd[:, i]) for i in range(3)]
                + [jnp.full((G, sub, SUBP), 3e4, jnp.float32),
                   jnp.ones((G, sub, SUBP), jnp.int32)])
        t0 = time.time()
        out = _wide_trace(*args, any_hit=False,
                          end_index=int(bufs.wide_end),
                          max_steps=4 * int(bufs.wide_end) + 64 + nudge,
                          leaf_cap=int(bufs.leaf_cap),
                          stack_size=int(bufs.wide_stack), ablate=ab)
        jax.block_until_ready(out)
        np.asarray(out[0][0, 0, :4])
        print(f"sub={sub:2d} ab={ab or '-':>8}: compile+run "
              f"{time.time()-t0:6.1f} s", flush=True)


if __name__ == "__main__":
    main()
