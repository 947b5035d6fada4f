"""Round-4 device A/B: width x leaf_rows x drain on the wide kernel.

Host-replay sim (experiments/leafcap_sim.py) says steps/packet on the
sorted arch-260k diffuse wave:
    w8/lr1 142.8 (r3 default)   w16/lr1 119.8 (-16%)
    w8/lr2 118.6                w16/lr2 100.3 (-30%)
    w8/lr4  97.5 (-32%)         w16/lr4  86.2 (-40%)
This measures what those step cuts buy in wall time: each variant needs
its own collapsed table (built via the production build_scene_buffers so
padding/stack sizing match exactly), timed interleaved same-window,
min-of-N, fresh eps-shifted inputs per call, D2H fence (tunnel quirks).

Usage: python experiments/r4_config_sweep.py [diffuse|shadow] [sub]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"
CFGS = [(8, 1, ""), (8, 1, "drain"), (16, 1, ""), (8, 2, ""),
        (16, 2, ""), (8, 4, ""), (16, 4, "")]


def build_variant(width, leaf_rows):
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    os.environ["LOUPIOTE_WIDE16"] = "1" if width == 16 else "0"
    os.environ["LOUPIOTE_LEAF_ROWS"] = str(leaf_rows)
    try:
        bufs = build_scene_buffers(build_arch_scene(260_000))
    finally:
        os.environ.pop("LOUPIOTE_WIDE16", None)
        os.environ.pop("LOUPIOTE_LEAF_ROWS", None)
    assert bufs.wide_width == width and bufs.wide_leaf_rows == leaf_rows
    return dict(rows=bufs.trav_rows, end=int(bufs.wide_end),
                stack=int(bufs.wide_stack), leaf_cap=int(bufs.leaf_cap),
                width=width, leaf_rows=leaf_rows)


def main(which="diffuse", sub=64):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_wide import SUBP, _wide_trace

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    any_hit = which == "shadow"
    R = min((len(dro) // (sub * SUBP)) * sub * SUBP, 512 * 8 * SUBP)

    tables = {}
    for w, lr, _ in CFGS:
        if (w, lr) not in tables:
            t0 = time.time()
            tables[(w, lr)] = build_variant(w, lr)
            print(f"built w{w}/lr{lr}: rows={tables[(w, lr)]['rows'].shape[0]}"
                  f" ({time.time() - t0:.0f}s)", flush=True)

    def flat(x):
        return jnp.asarray(x[:R])

    dev = jax.device_put(dict(
        ox=flat(dro[:, 0]), oy=flat(dro[:, 1]), oz=flat(dro[:, 2]),
        dx=flat(drd[:, 0]), dy=flat(drd[:, 1]), dz=flat(drd[:, 2]),
        t0=jnp.full(R, 30.0 if any_hit else 3e4, jnp.float32),
        act=flat(alive.astype(np.int32))))
    rows_dev = {k: jax.device_put(jnp.asarray(v["rows"]))
                for k, v in tables.items()}

    @functools.partial(jax.jit,
                       static_argnames=("w", "lr", "ab", "end", "stk", "lc"))
    def run(rows, d, eps, w, lr, ab, end, stk, lc):
        def shape(x):
            return x.reshape(R // (sub * SUBP), sub, SUBP)

        t, tri = _wide_trace(
            rows, shape(d["ox"] + eps), shape(d["oy"]), shape(d["oz"]),
            shape(d["dx"]), shape(d["dy"]), shape(d["dz"]),
            shape(d["t0"]), shape(d["act"]),
            any_hit=any_hit, end_index=end, max_steps=4 * end + 64,
            leaf_cap=lc, stack_size=stk, ablate=ab, width=w, leaf_rows=lr,
            interpret=os.environ.get("SWEEP_INTERPRET") == "1")
        return t.reshape(R), tri.reshape(R)

    def args(c):
        w, lr, ab = c
        tb = tables[(w, lr)]
        return (rows_dev[(w, lr)], dev), dict(
            w=w, lr=lr, ab=ab, end=tb["end"], stk=tb["stack"],
            lc=tb["leaf_cap"])

    ref = None
    for c in CFGS:
        (rws, d), kw = args(c)
        t0 = time.time()
        o = jax.block_until_ready(run(rws, d, jnp.float32(0.0), **kw))
        outv = np.asarray(o[0] if any_hit else o[1])
        if ref is None:
            ref = outv
        agree = ((outv >= 0) == (ref >= 0)).mean() if not any_hit \
            else (outv == ref).mean()
        print(f"compiled {c}: {time.time() - t0:.0f}s "
              f"(agree {agree * 100:.2f}%)", flush=True)

    best = {c: float("inf") for c in CFGS}
    for i in range(6):
        for c in CFGS:
            (rws, d), kw = args(c)
            eps = jnp.float32((i + 1) * 1e-6)
            t0 = time.time()
            o = run(rws, d, eps, **kw)
            jax.block_until_ready(o)
            np.asarray(o[0][:4])
            best[c] = min(best[c], time.time() - t0)
        print(f"round {i} done", flush=True)
    for c in CFGS:
        w, lr, ab = c
        print(f"{which} sub={sub} w={w:2d} lr={lr} ab={ab or '-':>6}: "
              f"{best[c] * 1e3:7.1f} ms ({best[c] / R * 1e9:5.1f} ns/ray)",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "diffuse",
         int(sys.argv[2]) if len(sys.argv) > 2 else 64)
