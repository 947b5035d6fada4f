"""Pallas global bitonic sort vs jnp.sort (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from experiments.treelet.device_sort import device_sort


@pytest.mark.parametrize("n,chunk_log", [
    (1024, 10),       # single chunk, exact pow2
    (4096, 10),       # 4 chunks: cross-chunk merge path
    (700, 10),        # padding path
    (5000, 10),       # padding + multi-chunk
    (16384, 11),      # deeper merge (8 chunks of 2048)
])
def test_sorts_match_reference(n, chunk_log):
    rng = np.random.default_rng(n)
    keys = rng.integers(0, 1 << 30, n, dtype=np.int32)
    vals = np.arange(n, dtype=np.int32)
    ks, vs = device_sort(jnp.asarray(keys), jnp.asarray(vals),
                         chunk_log=chunk_log, interpret=True)
    ks, vs = np.asarray(ks), np.asarray(vs)
    ref = np.sort(keys)
    np.testing.assert_array_equal(ks, ref)
    # Payload rides with its key.
    np.testing.assert_array_equal(keys[vs], ks)


def test_duplicate_keys_keep_payload_multiset():
    rng = np.random.default_rng(7)
    n = 3000
    keys = rng.integers(0, 50, n, dtype=np.int32)  # heavy duplicates
    vals = np.arange(n, dtype=np.int32)
    ks, vs = device_sort(jnp.asarray(keys), jnp.asarray(vals),
                         chunk_log=10, interpret=True)
    ks, vs = np.asarray(ks), np.asarray(vs)
    np.testing.assert_array_equal(ks, np.sort(keys))
    assert sorted(vs.tolist()) == list(range(n))
    np.testing.assert_array_equal(keys[vs], ks)


def test_keys_only():
    rng = np.random.default_rng(3)
    keys = rng.integers(-(1 << 20), 1 << 20, 2048).astype(np.int32)
    ks, _ = device_sort(jnp.asarray(keys), chunk_log=10, interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(keys))
