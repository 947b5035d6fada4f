"""Why is the persistent compile cache empty? (warm compile = 57.8 s)

Every entry point sets jax_compilation_cache_dir, yet the dir holds ~0
bytes after full bench runs, and the bench's warm-compile probe pays a
full recompile. This probe turns on the cache module's DEBUG logging,
compiles one medium XLA program and one small Pallas program, and prints
the cache dir contents plus the re-jit time after clear_caches() — so
the failure mode (backend refuses serialization / key instability /
silent write error) is named instead of guessed.

Usage: python experiments/cache_probe.py
"""

import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/root/.cache/jax_comp_cache"


def ls_cache(tag):
    names = sorted(os.listdir(CACHE)) if os.path.isdir(CACHE) else []
    total = sum(os.path.getsize(os.path.join(CACHE, n)) for n in names)
    print(f"[{tag}] cache entries={len(names)} bytes={total}", flush=True)
    for n in names[:5]:
        print("   ", n[:80], flush=True)


def main():
    logging.basicConfig(level=logging.WARNING)
    for mod in ("jax._src.compilation_cache", "jax._src.cache_key",
                "jax._src.compiler"):
        logging.getLogger(mod).setLevel(logging.DEBUG)

    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:  # not all versions have it
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    ls_cache("start")

    # Medium XLA program (compile > 1 s so every threshold passes).
    @jax.jit
    def f(x):
        for _ in range(24):
            x = jnp.tanh(x @ x) + x
        return x.sum()

    x = jnp.ones((512, 512), jnp.float32)
    t0 = time.time()
    f(x).block_until_ready()
    print(f"xla compile: {time.time()-t0:.1f}s", flush=True)
    ls_cache("after xla")

    # Small Pallas program (the bench's executables are all Pallas).
    from loupiote_tpu.ops.slab_sort import slab_sort

    k = jnp.arange(16384, dtype=jnp.int32)[::-1]
    t0 = time.time()
    jax.block_until_ready(slab_sort(k, [k]))
    print(f"pallas compile: {time.time()-t0:.1f}s", flush=True)
    ls_cache("after pallas")

    # Warm path: drop in-memory executables, re-jit the same programs.
    jax.clear_caches()

    @jax.jit
    def f2(x):
        for _ in range(24):
            x = jnp.tanh(x @ x) + x
        return x.sum()

    t0 = time.time()
    f2(x).block_until_ready()
    print(f"xla RE-compile after clear_caches: {time.time()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
