"""In-process, interleaved flush-cost attribution for the wide kernel.

order_ab.py showed the step is NOT vector-op bound (dropping the rank
matrix changed nothing): inert steps cost ~571 ns, active ~1.4 us.
Removal-style ablations corrupt t and collapse the traversal (first
attempt was uninterpretable), so this census DUPLICATES blocks instead:
results are provably identical, control flow is exact, and the timing
delta over the production kernel attributes the block's cost.

  full      production kernel
  mt2x      flush runs the 14-tri MT math twice   -> delta = MT op cost
  fetch2x   flush re-fetches its 8 pend rows and runs MT again
            -> delta - mt2x_delta = flush dynamic-fetch cost
  main2x    traversal re-fetches its 8 rows (int-min folded)
            -> delta = traversal dynamic-fetch cost

Timed in the REAL regime (natural termination), interleaved in one
process so contention hits all variants equally.

Usage: python experiments/flush_census.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"
MS = 4096  # generous cap; all variants terminate naturally
VARIANTS = (os.environ.get("VARIANTS") or ",mt2x,fetch2x,main2x").split(",")


def main():
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
        t, _ = _wide_trace(
            d["rows"], d["ox"] + eps, d["oy"], d["oz"],
            d["dx"], d["dy"], d["dz"], d["t0"], d["act"],
            any_hit=False, end_index=int(bufs.wide_end), max_steps=MS,
            leaf_cap=int(bufs.leaf_cap), stack_size=int(bufs.wide_stack),
            ablate=ab)
        return t

    outs = {}
    for ab in VARIANTS:
        outs[ab] = np.asarray(jax.block_until_ready(
            run(dev, jnp.float32(0.0), ab)))
        same = (outs[ab] == outs[""]).mean()
        print(f"compiled {ab or 'full'} (agree {same*100:.2f}%)",
              flush=True)

    best = {ab: float("inf") for ab in VARIANTS}
    for i in range(8):
        for ab in VARIANTS:
            eps = jnp.float32((i + 1) * 1e-6)
            t0 = time.time()
            o = run(dev, eps, ab)
            jax.block_until_ready(o)
            np.asarray(o[0, 0, :4])
            best[ab] = min(best[ab], time.time() - t0)
    base = best[""]
    for ab in VARIANTS:
        print(f"{ab or 'full':>8}: {best[ab]*1e3:7.1f} ms "
              f"(delta {(best[ab]-base)*1e3:+6.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
