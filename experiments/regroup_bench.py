"""Device decision experiment (VERDICT r3 #6): counting-scatter regroup
vs the XLA sort it must beat by >= 2x to unlock treelet phase 2.

Times, at treelet-realistic scales (pairs = rays x ~2.4 pendings,
K ~ thousands of subtrees, Morton-local keys):
  xla_sort      — jnp.sort_key_val(key, payload) (the r2/r3 baseline)
  slab_sort     — coarse pass alone (64k-cell bitonic, one dispatch)
  regroup       — full counting_regroup (slab sort + glue + DMA scatter)
Correctness is asserted on device (per-key counts + membership sample).

Usage: python experiments/regroup_bench.py [n_pairs] [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_pairs(rng, R, K):
    """Morton-local keys: ray blocks visit nearby subtrees (matches the
    measured treelet pair locality: ~55 distinct subtrees per kilo-pair)."""
    base = (np.arange(R) / R * K).astype(np.int32)
    jitter = (rng.standard_normal(R) * (K * 0.02)).astype(np.int32)
    keys = np.clip(base + jitter, 0, K - 1).astype(np.int32)
    payload = rng.integers(0, 1 << 22, R).astype(np.int32)
    return keys, payload


def main(R=2 ** 23, K=4096):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from experiments.treelet.regroup import counting_regroup
    from loupiote_tpu.ops.slab_sort import slab_sort

    rng = np.random.default_rng(7)
    keys, payload = synth_pairs(rng, R, K)
    kd, pd = jax.device_put(jnp.asarray(keys)), jax.device_put(
        jnp.asarray(payload))

    runs = {}

    def timeit(name, fn, *args, **kw):
        t0 = time.time()
        o = jax.block_until_ready(fn(*args, **kw))
        first = time.time() - t0
        best = float("inf")
        for i in range(4):
            # Fresh inputs per timed call (tunnel result-caching quirk).
            kk = kd + jnp.int32(0) * i
            pp = pd + jnp.int32(i)
            t0 = time.time()
            o = fn(kk, pp, *args[2:], **kw)
            jax.block_until_ready(o)
            np.asarray(jax.tree.leaves(o)[0][:4])
            best = min(best, time.time() - t0)
        runs[name] = (best, first)
        print(f"{name:12s}: {best * 1e3:8.1f} ms "
              f"({best / R * 1e9:6.1f} ns/elem; first {first:.1f}s)",
              flush=True)
        return o

    interp = os.environ.get("REGROUP_INTERPRET") == "1"  # CPU smoke
    xs = timeit("xla_sort",
                jax.jit(lambda k, p: jax.lax.sort_key_val(k, p)), kd, pd)
    timeit("xla_argsortG",
           jax.jit(lambda k, p: p[jnp.argsort(k)]), kd, pd)
    timeit("slab_sort",
           jax.jit(lambda k, p: slab_sort(k, [p], interpret=interp)),
           kd, pd)
    out = timeit("regroup",
                 jax.jit(lambda k, p: counting_regroup(
                     k, p, K, interpret=interp)), kd, pd)

    # Correctness: counts per key match, membership spot check.
    o, starts, counts = (np.asarray(x) for x in out)
    hist = np.bincount(keys, minlength=K)
    assert (counts == hist).all(), "per-key counts mismatch"
    ref_sorted = np.asarray(xs[1])
    csum = np.concatenate([[0], np.cumsum(hist)])
    for k in rng.choice(K, 32, replace=False):
        got = np.sort(o[starts[k]:starts[k] + counts[k]])
        want = np.sort(ref_sorted[csum[k]:csum[k + 1]])
        assert (got == want).all(), f"membership mismatch at key {k}"
    print("correctness OK; speedup vs xla_sort: "
          f"{runs['xla_sort'][0] / runs['regroup'][0]:.2f}x", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2 ** 23,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4096)
