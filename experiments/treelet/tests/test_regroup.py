"""Counting-scatter regroup (ops/regroup.py) vs a numpy group-by oracle.

Interpret mode on CPU; the same kernels compile with Mosaic on TPU
(experiments/regroup_bench.py times them against the XLA sort the design
must beat — ROADMAP "treelet regroup" boss fight, VERDICT r3 #6).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from experiments.treelet.regroup import counting_regroup, scatter_runs  # noqa: E402


def _check_grouped(keys, payload, out, starts, counts, K):
    out, starts, counts = (np.asarray(out), np.asarray(starts),
                           np.asarray(counts))
    by_key = {}
    for k, p in zip(keys, payload):
        by_key.setdefault(int(k), []).append(int(p))
    total = 0
    for k in range(K):
        want = sorted(by_key.get(k, []))
        got = sorted(out[starts[k]:starts[k] + counts[k]].tolist())
        assert counts[k] == len(want), (k, counts[k], len(want))
        assert got == want, f"key {k}: {got[:8]} != {want[:8]}"
        total += len(want)
    assert total == len(keys)


def test_scatter_runs_exact():
    rng = np.random.default_rng(0)
    G, SLAB, CH = 3, 1024, 256
    data = rng.integers(0, 1 << 20, (G, SLAB)).astype(np.int32)
    datap = np.concatenate([data, np.zeros((G, CH), np.int32)], axis=1)
    MAXR = 8
    nruns = np.zeros(G, np.int32)
    src = np.zeros((G, MAXR), np.int32)
    dst = np.zeros((G, MAXR), np.int32)
    lens = np.zeros((G, MAXR), np.int32)
    out_rows = G * SLAB * 2
    expect = np.full(out_rows, -1, np.int32)
    cursor = 0
    for g in range(G):
        bounds = np.sort(rng.choice(SLAB - 1, 3, replace=False) + 1)
        pieces = np.split(np.arange(SLAB), bounds)
        nruns[g] = len(pieces)
        for r, p in enumerate(pieces):
            src[g, r] = p[0]
            lens[g, r] = len(p)
            dst[g, r] = cursor
            expect[cursor:cursor + len(p)] = data[g, p]
            cursor += len(p) + CH  # spill slack between runs
    out = np.asarray(scatter_runs(
        jnp.asarray(datap), jnp.asarray(nruns), jnp.asarray(src),
        jnp.asarray(dst), jnp.asarray(lens), out_rows=out_rows,
        chunk=CH, interpret=True))
    mask = expect >= 0
    np.testing.assert_array_equal(out[mask], expect[mask])


@pytest.mark.parametrize("R,K,seed", [(3000, 37, 1), (1024, 5, 2),
                                      (5000, 300, 3)])
def test_counting_regroup_uniform(R, K, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, K, R).astype(np.int32)
    payload = np.arange(R, dtype=np.int32)
    out, starts, counts = counting_regroup(
        jnp.asarray(keys), jnp.asarray(payload), K, slab_log=10,
        interpret=True)
    _check_grouped(keys, payload, out, starts, counts, K)


def test_counting_regroup_hot_and_empty_keys():
    """A dominant hot key (multi-chunk runs in every cell) plus keys with
    zero elements; exercises spill into the per-key gap."""
    rng = np.random.default_rng(4)
    R, K = 4096, 16
    keys = np.where(rng.random(R) < 0.7, 3,
                    rng.integers(0, K, R)).astype(np.int32)
    keys[keys == 9] = 3  # key 9 guaranteed empty
    payload = rng.integers(0, 1 << 20, R).astype(np.int32)
    out, starts, counts = counting_regroup(
        jnp.asarray(keys), jnp.asarray(payload), K, slab_log=10,
        interpret=True)
    assert int(np.asarray(counts)[9]) == 0
    _check_grouped(keys, payload, out, starts, counts, K)


def test_counting_regroup_single_cell():
    rng = np.random.default_rng(5)
    R, K = 700, 11  # R < one slab
    keys = rng.integers(0, K, R).astype(np.int32)
    payload = rng.integers(0, 1 << 20, R).astype(np.int32)
    out, starts, counts = counting_regroup(
        jnp.asarray(keys), jnp.asarray(payload), K, slab_log=10,
        interpret=True)
    _check_grouped(keys, payload, out, starts, counts, K)


def test_block_regroup_blocks_single_key():
    from experiments.treelet.regroup import block_regroup

    rng = np.random.default_rng(6)
    R, K, TILE = 6000, 23, 256
    keys = rng.integers(0, K + 1, R).astype(np.int32)  # K == dump key
    rays = rng.integers(0, R, R).astype(np.int32)
    ray_out, sid_blocks, on = block_regroup(
        jnp.asarray(keys), jnp.asarray(rays), K, tile=TILE,
        slab_log=10, interpret=True)
    ray_out, sid_blocks, on = (np.asarray(ray_out), np.asarray(sid_blocks),
                               np.asarray(on))
    B = len(sid_blocks)
    assert ray_out.shape == (B * TILE,) and on.shape == (B * TILE,)
    # Multiset per key: on-pairs of each block belong to the block's sid.
    by_key = {}
    for b in range(B):
        sl = slice(b * TILE, (b + 1) * TILE)
        vals = ray_out[sl][on[sl] > 0]
        by_key.setdefault(int(sid_blocks[b]), []).extend(vals.tolist())
    dump = keys > K - 1
    for k in range(K):
        want = sorted(rays[keys == k].tolist())
        got = sorted(by_key.get(k, []))
        assert got == want, f"key {k}"
    assert sum(len(v) for v in by_key.values()) == int((~dump).sum())
