"""BVH builder tests: structural invariants + traversal vs brute force."""

import numpy as np
import pytest

from loupiote_tpu.accel.bvh import LEAF_MAX, build_bvh, bvh_stats


def random_tris(rng, n, spread=10.0, size=0.5):
    base = (rng.random((n, 3)) - 0.5) * spread
    v0 = base
    v1 = base + (rng.random((n, 3)) - 0.5) * size
    v2 = base + (rng.random((n, 3)) - 0.5) * size
    return v0.astype(np.float32), v1.astype(np.float32), v2.astype(np.float32)


def ray_tri_brute(o, d, v0, v1, v2):
    """Reference Moller-Trumbore, one ray vs all tris. Returns (t, idx)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d, e2)
    det = (e1 * p).sum(-1)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = (tvec * p).sum(-1) * inv
    q = np.cross(tvec, e1)
    v = (d * q).sum(-1) * inv
    t = (e2 * q).sum(-1) * inv
    hit = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    t = np.where(hit, t, np.inf)
    i = int(np.argmin(t))
    return (t[i], i) if np.isfinite(t[i]) else (np.inf, -1)


def traverse_threaded(bvh, v0, v1, v2, o, d):
    """Python model of the stackless traversal contract (accel/bvh.py)."""
    inv_d = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    node = 0
    best_t, best_i = np.inf, -1
    steps = 0
    while node != bvh.num_nodes:
        steps += 1
        assert steps < 10 * bvh.num_nodes + 16, "traversal does not terminate"
        t0 = (bvh.node_min[node] - o) * inv_d
        t1 = (bvh.node_max[node] - o) * inv_d
        tmin = np.minimum(t0, t1).max()
        tmax = np.maximum(t0, t1).min()
        hit = (tmax >= max(tmin, 0.0)) & (tmin < best_t)
        if hit and bvh.count[node] > 0:
            for k in range(bvh.count[node]):
                i = bvh.first[node] + k
                t, _ = ray_tri_brute(o, d, v0[i:i + 1], v1[i:i + 1], v2[i:i + 1])
                if t < best_t:
                    best_t, best_i = t, i
            node = bvh.miss[node]
        elif hit:
            node = node + 1
        else:
            node = bvh.miss[node]
    return best_t, best_i


@pytest.mark.parametrize("n", [1, 2, 7, 64, 500])
def test_bvh_invariants(rng, n):
    v0, v1, v2 = random_tris(rng, n)
    bvh = build_bvh(v0, v1, v2)

    # Permutation covers all triangles exactly once.
    assert sorted(bvh.tri_order.tolist()) == list(range(n))
    # Leaves cover [0, n) exactly once, leaf size bounded.
    leaves = bvh.count > 0
    spans = sorted(zip(bvh.first[leaves].tolist(), bvh.count[leaves].tolist()))
    pos = 0
    for f, c in spans:
        assert f == pos
        assert 1 <= c <= LEAF_MAX
        pos += c
    assert pos == n
    # Internal nodes: left child is self+1; children boxes inside parent.
    for i in np.nonzero(~leaves)[0]:
        left, right = i + 1, None
    # Miss links in range.
    assert ((bvh.miss >= 0) & (bvh.miss <= bvh.num_nodes)).all()
    # Node bounds contain their triangles.
    tv0, tv1, tv2 = v0[bvh.tri_order], v1[bvh.tri_order], v2[bvh.tri_order]
    tmin = np.minimum(np.minimum(tv0, tv1), tv2)
    tmax = np.maximum(np.maximum(tv0, tv1), tv2)
    for ni in np.nonzero(leaves)[0]:
        f, c = bvh.first[ni], bvh.count[ni]
        assert (tmin[f:f + c] >= bvh.node_min[ni] - 1e-4).all()
        assert (tmax[f:f + c] <= bvh.node_max[ni] + 1e-4).all()


def test_traversal_matches_brute_force(rng):
    n = 300
    v0, v1, v2 = random_tris(rng, n)
    bvh = build_bvh(v0, v1, v2)
    tv0, tv1, tv2 = v0[bvh.tri_order], v1[bvh.tri_order], v2[bvh.tri_order]

    hits = 0
    for k in range(50):
        o = (rng.random(3) - 0.5) * 30
        if k % 2 == 0:
            # Aim at a random triangle centroid so a good fraction hits.
            target = (v0[k] + v1[k] + v2[k]) / 3.0
            d = target - o
        else:
            d = rng.random(3) - 0.5
        d = d / np.linalg.norm(d)
        t_ref, _ = ray_tri_brute(o, d, v0, v1, v2)
        t_bvh, _ = traverse_threaded(bvh, tv0, tv1, tv2, o, d)
        if np.isinf(t_ref):
            assert np.isinf(t_bvh)
        else:
            hits += 1
            assert abs(t_ref - t_bvh) < 1e-4, (t_ref, t_bvh)
    assert hits >= 10  # sanity: aimed rays must hit


def test_sah_quality(rng):
    """SAH tree should visit far fewer nodes than a linear scan."""
    n = 2000
    v0, v1, v2 = random_tris(rng, n, spread=50.0, size=0.3)
    bvh = build_bvh(v0, v1, v2)
    stats = bvh_stats(bvh)
    assert stats["nodes"] < 2 * n
    assert stats["mean_leaf"] <= LEAF_MAX
