"""Decompose per-step kernel cost: time diffuse wave at reduced leaf_cap.

leaf_cap < actual produces WRONG results — this is a timing probe only.
If time scales ~linearly with leaf_cap, the unconditional Moller-Trumbore
unroll dominates the step cost and deferred-leaf batching is the right fix.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_traversal import build, make_waves  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_intersect import intersect_pallas
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order

    bufs, cam = build()
    ro, rd, dro, drd, alive = make_waves(bufs, cam)
    lo, hi = bufs.node_min[0], bufs.node_max[0]
    key = ray_sort_key(jnp.asarray(dro), jnp.asarray(drd),
                       jnp.asarray(alive), lo, hi)
    order = np.asarray(sort_order(key))
    sdro, sdrd = jnp.asarray(dro[order]), jnp.asarray(drd[order])
    salive = jnp.asarray(alive[order])

    for cap in (14, 7, 4, 1):
        b = bufs.replace(leaf_cap=cap)
        f = jax.jit(lambda a, c, act, b=b: intersect_pallas(b, a, c,
                                                            active=act))
        out = f(sdro, sdrd, salive)
        jax.block_until_ready(out.t)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = f(sdro, sdrd, salive)
            jax.block_until_ready(out.t)
            best = min(best, time.time() - t0)
        print(f"leaf_cap={cap}: diffuse_sorted {best*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
