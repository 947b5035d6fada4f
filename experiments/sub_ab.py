"""Same-window A/B of sub-packet rows per grid cell (SUB = 8/16/32).

The round-3 duplication census showed ~90% of wave time is FIXED
per-step loop overhead (vector ops, fetches, and the MT flush together
attribute < 15%). If so, processing more sub-packet rows per grid cell
amortizes that overhead almost linearly — the opposite of the round-2
"dual chains are neutral" conclusion, which this re-tests directly.

Usage: python experiments/sub_ab.py [diffuse|shadow|primary]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


def main(which="diffuse"):
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
    if which == "primary":
        dro, drd = data["pro"], data["prd"]
        alive = np.ones(len(dro), bool)
    else:
        dro, drd, alive = data["dro"], data["drd"], data["alive"]
    any_hit = which == "shadow"
    SUBS = [8, 16, 32]
    R = min((len(dro) // (32 * SUBP)) * 32 * SUBP, 512 * 8 * SUBP)

    def flat(x):
        return jnp.asarray(x[:R])

    dev = jax.device_put(dict(
        rows=bufs.trav_rows,
        ox=flat(dro[:, 0]), oy=flat(dro[:, 1]), oz=flat(dro[:, 2]),
        dx=flat(drd[:, 0]), dy=flat(drd[:, 1]), dz=flat(drd[:, 2]),
        t0=jnp.full(R, 30.0 if any_hit else 3e4, jnp.float32),
        act=flat(alive.astype(np.int32))))

    @functools.partial(jax.jit, static_argnames=("sub",))
    def run(d, eps, sub):
        def shape(x):
            return x.reshape(R // (sub * SUBP), sub, SUBP)

        t, tri = _wide_trace(
            d["rows"], shape(d["ox"] + eps), shape(d["oy"]),
            shape(d["oz"]), shape(d["dx"]), shape(d["dy"]),
            shape(d["dz"]), shape(d["t0"]), shape(d["act"]),
            any_hit=any_hit, end_index=int(bufs.wide_end),
            max_steps=4 * int(bufs.wide_end) + 64,
            leaf_cap=int(bufs.leaf_cap), stack_size=int(bufs.wide_stack))
        return t.reshape(R), tri.reshape(R)

    outs = {}
    for sub in SUBS:
        o = jax.block_until_ready(run(dev, jnp.float32(0.0), sub))
        outs[sub] = (np.asarray(o[0]), np.asarray(o[1]))
        agree = (outs[sub][1] == outs[8][1]).mean()
        print(f"compiled sub={sub} (tri agree {agree*100:.2f}%)",
              flush=True)

    best = {sub: float("inf") for sub in SUBS}
    for i in range(6):
        for sub in SUBS:
            eps = jnp.float32((i + 1) * 1e-6)
            t0 = time.time()
            o = run(dev, eps, sub)
            jax.block_until_ready(o)
            np.asarray(o[0][:4])
            best[sub] = min(best[sub], time.time() - t0)
    for sub in SUBS:
        print(f"{which} sub={sub:2d}: {best[sub]*1e3:7.1f} ms "
              f"({best[sub]/R*1e9:5.1f} ns/ray)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "diffuse")
