"""Same-window A/B of descent-order policies in the wide kernel.

Variants run INTERLEAVED in one process so tunnel contention hits all
equally (cross-window comparisons on this pool are off by 2-20x):
  octant    (ablate="")          hoisted slot^octant priority (new)
  pairwise  (ablate="pairwise")  round-2 exact union-tnear ranks
  index     (ablate="rank")      no ordering (floor)

Usage: python experiments/order_ab.py [diffuse|primary]
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

    from loupiote_tpu.ops.pallas_wide import TILE, _wide_trace
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    bufs = build_scene_buffers(build_arch_scene(260_000))
    data = np.load(WAVE)
    if which == "primary":
        dro, drd = data["pro"], data["prd"]
        alive = np.ones(len(dro), bool)
    else:
        dro, drd, alive = data["dro"], data["drd"], data["alive"]
    R = min((len(dro) // TILE) * TILE, 512 * TILE)
    G = R // TILE

    def shape(x):
        return jnp.asarray(x[:R].reshape(G, 8, 128))

    dev = jax.device_put(dict(
        rows=bufs.trav_rows,
        ox=shape(dro[:, 0]), oy=shape(dro[:, 1]), oz=shape(dro[:, 2]),
        dx=shape(drd[:, 0]), dy=shape(drd[:, 1]), dz=shape(drd[:, 2]),
        t0=jnp.full((G, 8, 128), 3e4, jnp.float32),
        act=shape(alive.astype(np.int32))))

    @functools.partial(jax.jit, static_argnames=("ab",))
    def run(d, eps, ab):
        t, tri = _wide_trace(
            d["rows"], d["ox"] + eps, d["oy"], d["oz"],
            d["dx"], d["dy"], d["dz"], d["t0"], d["act"],
            any_hit=False, end_index=int(bufs.wide_end),
            max_steps=4 * int(bufs.wide_end) + 64,
            leaf_cap=int(bufs.leaf_cap), stack_size=int(bufs.wide_stack),
            ablate=ab)
        return t

    variants = ["", "pairwise", "rank"]
    outs = {}
    for ab in variants:  # compile + first-exec materialization
        outs[ab] = np.asarray(jax.block_until_ready(
            run(dev, jnp.float32(0.0), ab)))
        print(f"compiled {ab or 'octant'}", flush=True)
    a, b = outs[""], outs["pairwise"]
    print(f"octant vs pairwise agree: {(a == b).mean()*100:.3f}% "
          f"(close: {np.isclose(a, b, rtol=1e-5).mean()*100:.3f}%)",
          flush=True)

    best = {ab: float("inf") for ab in variants}
    for i in range(6):
        for ab in variants:
            eps = jnp.float32((i + 1) * 1e-6)
            t0 = time.time()
            o = run(dev, eps, ab)
            jax.block_until_ready(o)
            np.asarray(o[0, 0, :4])
            best[ab] = min(best[ab], time.time() - t0)
    for ab in variants:
        name = ab or "octant"
        print(f"{name:>9}: {best[ab]*1e3:7.1f} ms "
              f"({best[ab]/R*1e9:5.1f} ns/ray)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "diffuse")
