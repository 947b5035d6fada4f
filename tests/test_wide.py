"""Wide (8-ary) BVH traversal kernel vs the SIMT oracle (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from loupiote_tpu.accel.bvh import build_bvh
from loupiote_tpu.accel.wide import collapse_wide
from loupiote_tpu.ops.intersect import intersect_rays
from loupiote_tpu.ops.pallas_wide import (TILE, intersect_wide,
                                          occluded_wide)
from loupiote_tpu.scene import Scene, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh

from test_bvh import random_tris


@pytest.fixture(scope="module")
def tri_scene():
    rng = np.random.default_rng(4321)
    n = 500
    v0, v1, v2 = random_tris(rng, n, spread=10.0, size=1.0)
    scene = Scene.default()
    pos = np.empty((n * 3, 3), np.float32)
    pos[0::3], pos[1::3], pos[2::3] = v0, v1, v2
    scene.meshes.append(Mesh(pos, None, None,
                             np.arange(n * 3, dtype=np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    return build_scene_buffers(scene), (v0, v1, v2)


def _rays(tris, R, seed=77):
    rng = np.random.default_rng(seed)
    v0, v1, _ = tris
    n = len(v0)
    ro = ((rng.random((R, 3)) - 0.5) * 25).astype(np.float32)
    tgt = (v0[rng.integers(0, n, R)] + v1[rng.integers(0, n, R)]) / 2
    rd = np.where(rng.random((R, 1)) < 0.7, tgt - ro,
                  rng.random((R, 3)) - 0.5).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_wide_table_structure(tri_scene):
    bufs, _ = tri_scene
    assert bufs.trav_rows is not None
    rows = np.asarray(bufs.trav_rows)
    kinds = rows[:bufs.wide_end, 127].view(np.int32)
    n_leaf = int((kinds == 1).sum())
    n_wide = int((kinds == 0).sum())
    assert n_leaf + n_wide == bufs.wide_end
    # Every child pointer of a wide row is -1 or a valid row index; leaf
    # children carry the tag bit and point at leaf rows.
    from loupiote_tpu.accel.wide import LEAF_MASK, LEAF_TAG

    for c in range(8):
        ptr = rows[:bufs.wide_end][kinds == 0][:, 16 * c + 6].view(np.int32)
        tagged = (ptr >= 0) & (ptr & LEAF_TAG > 0)
        idx = ptr & LEAF_MASK
        assert ((ptr == -1) | ((idx >= 0) & (idx < bufs.wide_end))).all()
        leaf_kinds = rows[idx[tagged], 127].view(np.int32)
        assert (leaf_kinds == 1).all()
    # All triangles reachable: sum of leaf counts == num_tris.
    fc = rows[:bufs.wide_end][kinds == 1][:, 126].view(np.int32)
    assert int((fc & 15).sum()) == bufs.num_tris


def test_wide_matches_simt(tri_scene):
    bufs, tris = tri_scene
    ro, rd = _rays(tris, TILE)
    ref = intersect_rays(bufs, ro, rd)
    out = intersect_wide(bufs, ro, rd, interpret=True)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-4)
    tri_ref, tri_out = np.asarray(ref.tri), np.asarray(out.tri)
    mismatch = tri_ref != tri_out
    assert mismatch.mean() < 0.005  # t-ties may pick either triangle
    same = ~mismatch
    np.testing.assert_allclose(np.asarray(out.u)[same],
                               np.asarray(ref.u)[same], atol=1e-4)


def test_wide_anyhit_matches(tri_scene):
    bufs, tris = tri_scene
    ro, rd = _rays(tris, TILE, seed=78)
    for dval in (3.0, 1e30):
        dist = jnp.full(TILE, dval)
        ref = intersect_rays(bufs, ro, rd, tmax=dist, any_hit=True)
        out = occluded_wide(bufs, ro, rd, dist, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(ref.tri) >= 0)


def test_wide_active_mask(tri_scene):
    bufs, tris = tri_scene
    ro, rd = _rays(tris, TILE, seed=79)
    active = jnp.asarray(np.random.default_rng(80).random(TILE) < 0.5)
    out = intersect_wide(bufs, ro, rd, active=active, interpret=True)
    tri = np.asarray(out.tri)
    assert (tri[~np.asarray(active)] == -1).all()
    ref = intersect_rays(bufs, ro, rd)
    act = np.asarray(active)
    np.testing.assert_array_equal(tri[act], np.asarray(ref.tri)[act])


def test_wide_stack_need_is_sufficient():
    """Adversarial deep tree: a long diagonal strip of tiny triangles forces
    a deep BVH2; the collapse's stack_need bound must still hold (silent
    drops would show up as misses here)."""
    rng = np.random.default_rng(9)
    n = 2000
    base = np.cumsum(rng.random((n, 3)).astype(np.float32) * 0.01, axis=0)
    v0 = base
    v1 = base + np.float32([0.005, 0, 0])
    v2 = base + np.float32([0, 0.005, 0])
    scene = Scene.default()
    pos = np.empty((n * 3, 3), np.float32)
    pos[0::3], pos[1::3], pos[2::3] = v0, v1, v2
    scene.meshes.append(Mesh(pos, None, None,
                             np.arange(n * 3, dtype=np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    bufs = build_scene_buffers(scene)
    ro, rd = _rays((v0, v1, v2), TILE, seed=5)
    ref = intersect_rays(bufs, ro, rd)
    out = intersect_wide(bufs, ro, rd, interpret=True)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-4)


def test_collapse_wide_properties():
    rng = np.random.default_rng(11)
    v0, v1, v2 = random_tris(rng, 777, spread=5.0, size=0.3)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order
    p0 = v0[order]
    tri9 = np.concatenate([p0, v1[order] - p0, v2[order] - p0], axis=1)
    wide = collapse_wide(bvh, tri9.astype(np.float32))
    assert wide.end_index == wide.num_wide + wide.num_leaf_rows
    assert wide.stack_need >= 2
    # Leaf coverage: every BVH2 leaf appears exactly once.
    kinds = wide.trav_rows[:, 127].view(np.int32)
    assert (kinds == 1).sum() == (bvh.count > 0).sum()


@pytest.fixture(scope="module")
def tri_scene16():
    """Same geometry as tri_scene, built with the 16-ary (two-row-node)
    collapse (LOUPIOTE_WIDE16=1 path, accel/wide.py width=16)."""
    import os

    rng = np.random.default_rng(4321)
    n = 500
    v0, v1, v2 = random_tris(rng, n, spread=10.0, size=1.0)
    scene = Scene.default()
    pos = np.empty((n * 3, 3), np.float32)
    pos[0::3], pos[1::3], pos[2::3] = v0, v1, v2
    scene.meshes.append(Mesh(pos, None, None,
                             np.arange(n * 3, dtype=np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    os.environ["LOUPIOTE_WIDE16"] = "1"
    try:
        bufs = build_scene_buffers(scene)
    finally:
        del os.environ["LOUPIOTE_WIDE16"]
    assert bufs.wide_width == 16
    return bufs, (v0, v1, v2)


def test_wide16_table_structure(tri_scene16):
    bufs, _ = tri_scene16
    rows = np.asarray(bufs.trav_rows)
    kinds = rows[:bufs.wide_end, 127].view(np.int32)
    from loupiote_tpu.accel.wide import LEAF_MASK, LEAF_TAG

    # Internal nodes span two rows, both tagged kind 0; node pointers are
    # even (first-row) indices, leaf pointers carry the tag bit.
    wide_rows = np.flatnonzero(kinds == 0)
    first_rows = wide_rows[::2]
    for c in range(16):
        r_off, b = divmod(c, 8)
        ptr = rows[first_rows + r_off, 16 * b + 6].view(np.int32)
        tagged = (ptr >= 0) & (ptr & LEAF_TAG > 0)
        idx = ptr & LEAF_MASK
        assert ((ptr == -1) | ((idx >= 0) & (idx < bufs.wide_end))).all()
        assert (rows[idx[tagged], 127].view(np.int32) == 1).all()
        internal = (ptr >= 0) & ~tagged
        assert (ptr[internal] % 2 == 0).all()  # first-row addresses
    fc = rows[:bufs.wide_end][kinds == 1][:, 126].view(np.int32)
    assert int((fc & 15).sum()) == bufs.num_tris


def test_wide16_matches_simt(tri_scene16):
    bufs, tris = tri_scene16
    ro, rd = _rays(tris, TILE)
    ref = intersect_rays(bufs, ro, rd)
    out = intersect_wide(bufs, ro, rd, interpret=True)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-4)
    mismatch = np.asarray(ref.tri) != np.asarray(out.tri)
    assert mismatch.mean() < 0.005  # t-ties may pick either triangle


def test_wide16_anyhit_matches(tri_scene16):
    bufs, tris = tri_scene16
    ro, rd = _rays(tris, TILE, seed=78)
    for dval in (3.0, 1e30):
        dist = jnp.full(TILE, dval)
        ref = intersect_rays(bufs, ro, rd, tmax=dist, any_hit=True)
        out = occluded_wide(bufs, ro, rd, dist, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(ref.tri) >= 0)


def test_wide16_nodrain_matches(tri_scene16, monkeypatch):
    """The LOUPIOTE_NO_DRAIN kill-switch path must also be exact at 16."""
    import os

    bufs, tris = tri_scene16
    ro, rd = _rays(tris, TILE, seed=91)
    monkeypatch.setenv("LOUPIOTE_NO_DRAIN", "1")
    out = intersect_wide(bufs, ro, rd, interpret=True)
    ref = intersect_rays(bufs, ro, rd)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-4)


@pytest.fixture(scope="module", params=[(8, 2), (16, 2)],
                ids=["w8lr2", "w16lr2"])
def tri_scene_lr(request):
    """Multi-row-leaf variants (LOUPIOTE_LEAF_ROWS=2): leaves span two
    consecutive rows (up to 28 triangles), alone and stacked with the
    16-ary collapse."""
    import os

    width, lrows = request.param
    rng = np.random.default_rng(4321)
    n = 500
    v0, v1, v2 = random_tris(rng, n, spread=10.0, size=1.0)
    scene = Scene.default()
    pos = np.empty((n * 3, 3), np.float32)
    pos[0::3], pos[1::3], pos[2::3] = v0, v1, v2
    scene.meshes.append(Mesh(pos, None, None,
                             np.arange(n * 3, dtype=np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    if width == 16:
        os.environ["LOUPIOTE_WIDE16"] = "1"
    os.environ["LOUPIOTE_LEAF_ROWS"] = str(lrows)
    try:
        bufs = build_scene_buffers(scene)
    finally:
        os.environ.pop("LOUPIOTE_WIDE16", None)
        del os.environ["LOUPIOTE_LEAF_ROWS"]
    assert bufs.wide_leaf_rows == lrows and bufs.wide_width == width
    return bufs, (v0, v1, v2)


def test_leaf_rows_table_structure(tri_scene_lr):
    from loupiote_tpu.accel.wide import LEAF_MASK, LEAF_TAG

    bufs, _ = tri_scene_lr
    lrn = bufs.wide_leaf_rows
    rows = np.asarray(bufs.trav_rows)
    kinds = rows[:bufs.wide_end, 127].view(np.int32)
    wide_rows = np.flatnonzero(kinds == 0)
    first_leaf = bufs.wide_end - 1
    # Leaf pointers land on lrn-strided first rows; all lrn rows of a
    # leaf are tagged kind 1.
    for c in range(bufs.wide_width):
        r_off, b = divmod(c, 8)
        rpn = bufs.wide_width // 8
        ptr = rows[wide_rows[::rpn] + r_off, 16 * b + 6].view(np.int32)
        tagged = (ptr >= 0) & (ptr & LEAF_TAG > 0)
        idx = ptr & LEAF_MASK
        for j in range(lrn):
            assert (rows[idx[tagged] + j, 127].view(np.int32) == 1).all()
        first_leaf = min(first_leaf, idx[tagged].min(initial=first_leaf))
        n_wide_rows = len(wide_rows)
        assert (((idx[tagged] - n_wide_rows) % lrn) == 0).all()
    # Per-row triangle counts stay within one row's 14-slot budget and
    # the whole table still covers every triangle exactly once.
    fc = rows[:bufs.wide_end][kinds == 1][:, 126].view(np.int32)
    assert (fc & 15).max() <= 14
    assert int((fc & 15).sum()) == bufs.num_tris


def test_leaf_rows_matches_simt(tri_scene_lr):
    bufs, tris = tri_scene_lr
    ro, rd = _rays(tris, TILE)
    ref = intersect_rays(bufs, ro, rd)
    out = intersect_wide(bufs, ro, rd, interpret=True)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-4)
    mismatch = np.asarray(ref.tri) != np.asarray(out.tri)
    assert mismatch.mean() < 0.005  # t-ties may pick either triangle


def test_leaf_rows_anyhit_matches(tri_scene_lr):
    bufs, tris = tri_scene_lr
    ro, rd = _rays(tris, TILE, seed=78)
    for dval in (3.0, 1e30):
        dist = jnp.full(TILE, dval)
        ref = intersect_rays(bufs, ro, rd, tmax=dist, any_hit=True)
        out = occluded_wide(bufs, ro, rd, dist, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(ref.tri) >= 0)
