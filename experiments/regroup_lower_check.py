"""Client-side Mosaic lowering check for the counting-scatter kernel.

`jax.jit(...).lower()` runs the Pallas->Mosaic lowering (where the block
tiling checks live) WITHOUT submitting to the remote compile service, so
this validates kernel legality while other device work is in flight.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.treelet.regroup import block_regroup, counting_regroup


def main():
    R, K = 1 << 20, 512
    keys = jnp.asarray(np.random.default_rng(0).integers(0, K, R,
                                                         dtype=np.int32))
    pay = jnp.arange(R, dtype=jnp.int32)
    lo = jax.jit(lambda k, p: counting_regroup(k, p, K)).lower(keys, pay)
    print("counting_regroup lowered OK:", len(lo.as_text()) > 0)
    lo2 = jax.jit(lambda k, p: block_regroup(k, p, K)).lower(keys, pay)
    print("block_regroup lowered OK:", len(lo2.as_text()) > 0)


if __name__ == "__main__":
    main()
