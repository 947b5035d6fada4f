"""Round-4b device A/B on the wide kernel: sub rows {64,128} x unroll {2,4}.

ROADMAP round-4 queue: sub=128 was never measured (64 was the round-3
winner; gains taper but are near-free to try), and the body unroll depth
beyond 2 is untested. Both attack the same structural per-step overhead
the censuses left as the only real cost. Interleaved same-window timing
on the saved sorted diffuse/shadow wave, fresh eps inputs per call, D2H
fence (tunnel quirks per bench.py header).

Usage: python experiments/r4b_sweep.py [diffuse|shadow]
       (needs /tmp/subpacket_wave.npz — experiments/subpacket_sweep.py wave)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"
# Override with e.g. LOUPIOTE_R4B_CFGS="64:,64:unroll4" (sub:ablate pairs).
_env = os.environ.get("LOUPIOTE_R4B_CFGS")
if _env:
    # Tolerant parse: "64" (no colon) means an empty ablate string.
    CFGS = [(int(p.split(":")[0]),
             p.split(":", 1)[1] if ":" in p else "")
            for p in _env.split(",")]
else:
    CFGS = [(64, ""), (128, ""), (64, "unroll4"), (128, "unroll4")]


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
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    any_hit = which == "shadow"
    # R must be divisible by every configured sub (not a fixed 128).
    import math
    tile = math.lcm(*[c[0] for c in CFGS]) * SUBP
    R = min((len(dro) // tile) * tile, 512 * 8 * SUBP)

    def flat(x):
        return jnp.asarray(x[:R])

    dev = jax.device_put(dict(
        rows=bufs.trav_rows,
        ox=flat(dro[:, 0]), oy=flat(dro[:, 1]), oz=flat(dro[:, 2]),
        dx=flat(drd[:, 0]), dy=flat(drd[:, 1]), dz=flat(drd[:, 2]),
        t0=jnp.full(R, 30.0 if any_hit else 3e4, jnp.float32),
        act=flat(alive.astype(np.int32))))

    @functools.partial(jax.jit, static_argnames=("sub", "ab"))
    def run(d, eps, sub, ab):
        def shape(x):
            return x.reshape(R // (sub * SUBP), sub, SUBP)

        t, tri = _wide_trace(
            d["rows"], shape(d["ox"] + eps), shape(d["oy"]),
            shape(d["oz"]), shape(d["dx"]), shape(d["dy"]),
            shape(d["dz"]), shape(d["t0"]), shape(d["act"]),
            any_hit=any_hit, end_index=int(bufs.wide_end),
            max_steps=4 * int(bufs.wide_end) + 64,
            leaf_cap=int(bufs.leaf_cap), stack_size=int(bufs.wide_stack),
            ablate=ab)
        return t.reshape(R), tri.reshape(R)

    ref = None
    for c in CFGS:
        t0 = time.time()
        o = jax.block_until_ready(run(dev, jnp.float32(0.0), *c))
        outv = np.asarray(o[0] if any_hit else o[1])
        if ref is None:
            ref = outv
        agree = (outv == ref).mean() if any_hit \
            else ((outv >= 0) == (ref >= 0)).mean()
        print(f"compiled sub={c[0]} ab='{c[1]}': {time.time()-t0:.0f}s "
              f"(agree {agree*100:.2f}%)", flush=True)

    best = {c: float("inf") for c in CFGS}
    for i in range(6):
        for c in CFGS:
            eps = jnp.float32((i + 1) * 1e-6)
            t0 = time.time()
            o = run(dev, eps, *c)
            jax.block_until_ready(o)
            np.asarray(o[0][:4])
            best[c] = min(best[c], time.time() - t0)
        print(f"round {i} done", flush=True)
    for c in CFGS:
        print(f"{which} sub={c[0]:3d} ab={c[1] or '-':>8}: "
              f"{best[c]*1e3:7.1f} ms ({best[c]/R*1e9:5.1f} ns/ray)",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "diffuse")
