"""Is the while-loop carry (the (sub, stack_size) stack) the per-step
cost? Same-window A/B over stack_size at sub=8 and sub=32.

stack_size >= the builder's stack_need (59 here) keeps results exact;
larger sizes only change the carried state volume. If time scales with
stack_size, the carry save/restore is the unattributed ~90% of step
cost (every compute/fetch/extract census came back ~free).

Usage: python experiments/stack_ab.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


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
    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    CFGS = [(8, 64), (8, 128), (8, 256), (32, 64), (32, 128)]
    R = min((len(dro) // (32 * SUBP)) * 32 * SUBP, 512 * 8 * SUBP)

    def flat(x):
        return jnp.asarray(x[:R])

    dev = jax.device_put(dict(
        rows=bufs.trav_rows,
        ox=flat(dro[:, 0]), oy=flat(dro[:, 1]), oz=flat(dro[:, 2]),
        dx=flat(drd[:, 0]), dy=flat(drd[:, 1]), dz=flat(drd[:, 2]),
        t0=jnp.full(R, 3e4, jnp.float32),
        act=flat(alive.astype(np.int32))))

    @functools.partial(jax.jit, static_argnames=("sub", "stack"))
    def run(d, eps, sub, stack):
        def shape(x):
            return x.reshape(R // (sub * SUBP), sub, SUBP)

        t, tri = _wide_trace(
            d["rows"], shape(d["ox"] + eps), shape(d["oy"]),
            shape(d["oz"]), shape(d["dx"]), shape(d["dy"]),
            shape(d["dz"]), shape(d["t0"]), shape(d["act"]),
            any_hit=False, end_index=int(bufs.wide_end),
            max_steps=4 * int(bufs.wide_end) + 64,
            leaf_cap=int(bufs.leaf_cap), stack_size=stack)
        return t.reshape(R), tri.reshape(R)

    ref = None
    for c in CFGS:
        o = jax.block_until_ready(run(dev, jnp.float32(0.0), *c))
        tri = np.asarray(o[1])
        if ref is None:
            ref = tri
        print(f"compiled sub={c[0]} stack={c[1]} "
              f"(tri agree {(tri == ref).mean()*100:.2f}%)", flush=True)

    best = {c: float("inf") for c in CFGS}
    for i in range(6):
        for c in CFGS:
            eps = jnp.float32((i + 1) * 1e-6)
            t0 = time.time()
            o = run(dev, eps, *c)
            jax.block_until_ready(o)
            np.asarray(o[0][:4])
            best[c] = min(best[c], time.time() - t0)
    for c in CFGS:
        print(f"sub={c[0]:2d} stack={c[1]:3d}: {best[c]*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
