"""device_sort (Pallas global bitonic) vs lax.sort on TPU at wave scale.

Usage: python experiments/device_sort_bench.py [n] [chunk_log]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=8_388_608, chunk_log=16):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from experiments.treelet.device_sort import device_sort

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 30, n, dtype=np.int32)
    vals = np.arange(n, dtype=np.int32)

    ours = jax.jit(lambda k, v: device_sort(k, v, chunk_log=chunk_log))
    xla = jax.jit(lambda k, v: lax.sort((k, v), num_keys=1))

    for name, fn in (("device_sort", ours), ("lax.sort", xla)):
        t0 = time.time()
        o = fn(jnp.asarray(keys), jnp.asarray(vals))
        jax.block_until_ready(o)
        np.asarray(o[0][:4])
        compile_s = time.time() - t0
        best = float("inf")
        for i in range(4):
            k2 = jnp.asarray(keys ^ (i + 1))
            v2 = jnp.asarray(vals)
            t0 = time.time()
            o = fn(k2, v2)
            jax.block_until_ready(o)
            np.asarray(o[0][:4])
            best = min(best, time.time() - t0)
        print(f"{name} n={n} chunk=2^{chunk_log}: {best*1e3:.1f} ms "
              f"(compile {compile_s:.1f}s)", flush=True)
        ks, vs = (np.asarray(o[0]), np.asarray(o[1]))
        if name == "device_sort":
            ref = np.sort(keys ^ 4)
            ok = bool((ks == ref).all()) and bool(
                ((keys ^ 4)[vs] == ks).all())
            print(f"  correct={ok}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8_388_608,
         int(sys.argv[2]) if len(sys.argv) > 2 else 16)
