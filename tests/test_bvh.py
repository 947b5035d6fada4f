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


def _comb3_scene(leaf_max=1):
    """Deepest scene this builder will produce (~52 levels): self-similar
    exponential combs on all three axes (binned SAH peels a few triangles
    per level; extent shrinks ~16x per level, bounding depth by the float32
    exponent range)."""
    from loupiote_tpu.scene import Scene
    from loupiote_tpu.scene.types import Instance, Mesh

    pts, scale = [], []
    for ax in range(3):
        for i in range(-19, 19):
            p = np.zeros(3)
            p[ax] = 8.0 ** i
            pts.append(p)
            scale.append(8.0 ** i)
    p0 = np.array(pts, np.float32)
    s = np.array(scale, np.float32)[:, None] * 0.01
    e1 = np.tile(np.array([1.0, 1.0, 0.0], np.float32), (len(pts), 1)) * s
    e2 = np.tile(np.array([1.0, 0.0, 1.0], np.float32), (len(pts), 1)) * s
    n = p0.shape[0]
    verts = np.empty((3 * n, 3), np.float32)
    verts[0::3], verts[1::3], verts[2::3] = p0, p0 + e1, p0 + e2
    scene = Scene.default()
    scene.meshes = [Mesh(positions=verts, normals=None, texcoords=None,
                         indices=np.arange(3 * n, dtype=np.uint32))]
    scene.instances = [Instance(mesh_index=0, material_index=0,
                                model_to_world=np.eye(4, dtype=np.float32))]
    return scene


def _depth_recursive(bvh):
    """Reference depth via explicit child walk (independent of miss links)."""
    best = 0
    stack = [(0, 0)]
    while stack:
        node, d = stack.pop()
        best = max(best, d)
        if bvh.count[node] == 0:
            stack.append((node + 1, d + 1))
            stack.append((int(bvh.right[node]), d + 1))
    return best


def test_bvh_max_depth_matches_recursive_walk(rng):
    from loupiote_tpu.accel.bvh import build_bvh, bvh_max_depth

    for n in (5, 60, 500):
        v0, v1, v2 = random_tris(rng, n)
        bvh = build_bvh(v0, v1, v2, use_native=False)
        assert bvh_max_depth(bvh.count, bvh.miss) == _depth_recursive(bvh)


def test_deep_bvh_stack_sizing():
    """Traversal stacks are sized from the built tree's max depth, so deep
    trees cannot silently drop subtrees (ADVICE r1 medium). Demonstrated by
    showing an UNDERSIZED stack diverges from the stackless oracle on the
    deepest scene this builder produces, while the builder-derived size
    agrees exactly."""
    import jax.numpy as jnp

    from loupiote_tpu.accel.bvh import bvh_max_depth
    from loupiote_tpu.ops.intersect import intersect_packets, intersect_rays
    from loupiote_tpu.scene import build_scene_buffers

    bufs = build_scene_buffers(_comb3_scene(), leaf_max=1)
    depth = bvh_max_depth(np.asarray(bufs.node_count)[:bufs.num_nodes],
                          np.asarray(bufs.node_miss)[:bufs.num_nodes])
    assert depth > 40, f"comb scene unexpectedly shallow (depth={depth})"
    assert bufs.stack_depth >= depth + 2

    # Rays from far +xyz toward each triangle cluster center.
    R = 1024
    rng = np.random.default_rng(7)
    targets = 8.0 ** rng.integers(-19, 19, R)
    axis = rng.integers(0, 3, R)
    ro = np.full((R, 3), 50.0, np.float32)
    rd = np.zeros((R, 3), np.float32)
    for i in range(R):
        goal = np.full(3, 0.002 * targets[i], np.float32)
        goal[axis[i]] = targets[i]
        rd[i] = goal - ro[i]
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)

    oracle = intersect_rays(bufs, ro_j, rd_j)  # stackless: depth-immune
    ok = intersect_packets(bufs, ro_j, rd_j)
    np.testing.assert_array_equal(np.asarray(oracle.tri), np.asarray(ok.tri))

    # The same traversal with a too-small stack must corrupt results —
    # proving the stack_depth guard is load-bearing.
    starved = bufs.replace(stack_depth=2)
    bad = intersect_packets(starved, ro_j, rd_j)
    assert (np.asarray(bad.tri) != np.asarray(oracle.tri)).any()
