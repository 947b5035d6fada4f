"""Per-lane top-tree walk timing (treelet phase 1, ops/lane_top.py).

Moved out of bench.py in round 4: the treelet pipeline is opt-in and
blocked on the regroup-sort cost, so its phase-1 baseline doesn't belong
in the headline bench (tunnel minutes are scarce). Run directly:

    python experiments/lane_top_bench.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.random as jr

    from measure_traversal import build, make_waves

    from loupiote_tpu.accel.bvh import FlatBVH
    from experiments.treelet.lane_top import build_top_tables, lane_top_trace

    bufs, cam = build()
    _, _, dro, drd, alive = make_waves(bufs, cam)
    pixels = dro.shape[0]

    npk = np.asarray(bufs.node_pack)[:bufs.num_nodes]
    bvh = FlatBVH(
        node_min=npk[:, 0:3], node_max=npk[:, 3:6],
        first=npk[:, 6].view(np.int32), count=npk[:, 7].view(np.int32),
        miss=npk[:, 8].view(np.int32), right=npk[:, 9].view(np.int32),
        axis=npk[:, 10].view(np.int32),
        tri_order=np.arange(bufs.num_tris, dtype=np.int32))
    tables = build_top_tables(bvh, top_wide=200)
    tmax30 = jnp.full(pixels, 30.0)
    lt = jax.jit(lambda a, b, t, act: lane_top_trace(tables, a, b,
                                                     tmax=t, active=act))
    dro_j, drd_j = jnp.asarray(dro), jnp.asarray(drd)
    al_j = jnp.asarray(alive)
    best = float("inf")
    npend = None
    for i in range(4):
        # Fresh jitter on tmax defeats the tunnel's execution cache.
        tm = tmax30 + 1e-5 * i
        t0 = time.time()
        _, npend = jax.block_until_ready(lt(dro_j, drd_j, tm, al_j))
        if i:
            best = min(best, time.time() - t0)
    print(f"lane_top_ms={best * 1e3:.1f}")
    print(f"lane_top_mean_pend="
          f"{float(np.asarray(npend)[np.asarray(alive)].mean()):.2f}")


if __name__ == "__main__":
    main()
