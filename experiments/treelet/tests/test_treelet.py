"""Treelet pipeline: partition invariants, reference-walk equivalence, and
full-pipeline equality vs the SIMT oracle (interpret mode).

The pipeline must reproduce the IntersectorPass contract
(`/root/reference/crates/lib/src/renderer.rs:453-510`) exactly on the same
BVH as every other traversal implementation in ops/.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from loupiote_tpu.accel.bvh import build_bvh  # noqa: E402
from experiments.treelet.build import (NUM_FIELDS, SUB_END,  # noqa: E402
                                        build_treelets, walk_subtree_ref)
from loupiote_tpu.ops.intersect import intersect_rays  # noqa: E402


def _random_tris(rng, n, spread=10.0):
    base = (rng.random((n, 3), dtype=np.float32) - 0.5) * spread
    p0 = base
    p1 = base + (rng.random((n, 3), dtype=np.float32) - 0.5)
    p2 = base + (rng.random((n, 3), dtype=np.float32) - 0.5)
    return p0.astype(np.float32), p1.astype(np.float32), p2.astype(np.float32)


@pytest.fixture(scope="module")
def small_scene(rng):
    p0, p1, p2 = _random_tris(rng, 900)
    bvh = build_bvh(p0, p1, p2, use_native=False)
    o = bvh.tri_order
    p0, p1, p2 = p0[o], p1[o], p2[o]
    tri9 = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    tables = build_treelets(bvh, tri9, cap=96)  # small cap: many subtrees
    return bvh, tri9, tables


def test_partition_invariants(small_scene):
    bvh, tri9, tables = small_scene
    S = tables.num_subtrees
    assert S > 3
    assert (tables.sub_entries <= 96).all()
    f = tables.sub_fields.reshape(NUM_FIELDS, S, -1)
    link = f[9].view(np.int32)
    aux = f[10].view(np.int32)
    is_tri = (link >> 20) & 1
    # Every BVH triangle appears exactly once across subtree tables.
    gids = aux[is_tri > 0]
    assert sorted(gids.tolist()) == list(range(len(tri9)))
    # Local ordinal + base reproduces the global id.
    local = (link >> 21) & 1023
    si, ei = np.nonzero(is_tri)
    assert (tables.sub_tri_base[si] + local[si, ei] == aux[si, ei]).all()
    # Links stay in range.
    assert ((link & 1023) <= SUB_END).all()
    assert (((link >> 10) & 1023) <= SUB_END).all()


def test_subtree_walk_covers_tree(small_scene, rng):
    """Walking ALL subtrees per ray == brute-force closest hit."""
    bvh, tri9, tables = small_scene
    p0 = tri9[:, 0:3]
    e1 = tri9[:, 3:6]
    e2 = tri9[:, 6:9]
    for _ in range(40):
        ro = (rng.random(3) - 0.5).astype(np.float32) * 12
        rd = (rng.random(3) - 0.5).astype(np.float32)
        rd /= np.linalg.norm(rd)
        best_t, best_tri = 1e30, -1
        for si in range(tables.num_subtrees):
            t, tri = walk_subtree_ref(tables, si, ro, rd, best_t)
            if tri >= 0 and t < best_t:
                best_t, best_tri = t, tri
        # Brute force.
        pv = np.cross(rd, e2)
        det = np.einsum("ij,ij->i", e1, pv)
        iv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
        tv = ro - p0
        u = np.einsum("ij,ij->i", tv, pv) * iv
        qv = np.cross(tv, e1)
        v = np.einsum("ij,ij->i", np.broadcast_to(rd, e1.shape), qv) * iv
        t = np.einsum("ij,ij->i", e2, qv) * iv
        ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t > 1e-4))
        bf_t = t[ok].min() if ok.any() else 1e30
        if best_tri < 0:
            assert not ok.any() or bf_t >= 1e30
        else:
            assert best_t == pytest.approx(bf_t, rel=1e-5)


@pytest.fixture(scope="module")
def pipeline_scene(rng):
    """SceneBuffers with treelets forced on, sized to several subtrees."""
    from loupiote_tpu.scene import Scene, build_scene_buffers
    from loupiote_tpu.scene.types import Mesh, Instance

    p0, p1, p2 = _random_tris(rng, 2500, spread=8.0)
    n = len(p0)
    positions = np.concatenate([p0, p1, p2]).astype(np.float32)
    indices = np.arange(3 * n, dtype=np.int32).reshape(3, n).T.reshape(-1)
    scene = Scene.default()
    scene.meshes.append(Mesh(positions=positions, normals=None,
                             texcoords=None, indices=indices))
    scene.instances.append(Instance(
        mesh_index=len(scene.meshes) - 1,
        model_to_world=np.eye(4, dtype=np.float32), material_index=0))
    return build_scene_buffers(scene, treelets=True)


def _pipeline_vs_oracle(bufs, rng, any_hit):
    from experiments.treelet.pipeline import treelet_intersect

    R = 2048
    ro = ((rng.random((R, 3)) - 0.5) * 10).astype(np.float32)
    rd = (rng.random((R, 3)) - 0.5).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    active = rng.random(R) > 0.1
    tmax = np.where(rng.random(R) > 0.5, 6.0, 1e30).astype(np.float32)

    got = treelet_intersect(bufs, jnp.asarray(ro), jnp.asarray(rd),
                            tmax=jnp.asarray(tmax),
                            active=jnp.asarray(active),
                            any_hit=any_hit, interpret=True)
    want = intersect_rays(bufs, jnp.asarray(ro), jnp.asarray(rd),
                          tmax=jnp.asarray(tmax),
                          active=jnp.asarray(active), any_hit=any_hit)
    got_hit = np.asarray(got.tri) >= 0
    want_hit = np.asarray(want.tri) >= 0
    if any_hit:
        # Any-hit: agreement on blocked/not-blocked.
        assert (got_hit == want_hit).all()
        return
    assert (got_hit == want_hit).all()
    h = got_hit
    assert np.allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                       rtol=1e-5)
    same_tri = np.asarray(got.tri)[h] == np.asarray(want.tri)[h]
    # Tie-breaks on exactly-equal t may pick a different triangle.
    ties = np.isclose(np.asarray(got.t)[h], np.asarray(want.t)[h])
    assert (same_tri | ties).all()
    agree = same_tri.mean()
    assert agree > 0.999, f"tri agreement {agree}"


def test_pipeline_closest_vs_oracle(pipeline_scene, rng):
    _pipeline_vs_oracle(pipeline_scene, rng, any_hit=False)


def test_pipeline_budget_overflow_falls_back(pipeline_scene, rng,
                                             monkeypatch):
    """A starved pair budget must route rays through the wide-kernel
    fallback, never silently drop geometry."""
    import experiments.treelet.pipeline as tp

    monkeypatch.setattr(tp, "PAIR_BUDGET", 1)
    R = 1024  # fresh shape -> fresh trace picks up the patched budget
    ro = ((rng.random((R, 3)) - 0.5) * 10).astype(np.float32)
    rd = (rng.random((R, 3)) - 0.5).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    got = tp.treelet_intersect(pipeline_scene, jnp.asarray(ro),
                               jnp.asarray(rd), interpret=True)
    want = intersect_rays(pipeline_scene, jnp.asarray(ro), jnp.asarray(rd))
    assert (np.asarray(got.tri) >= 0).sum() > 0
    h = np.asarray(want.tri) >= 0
    assert ((np.asarray(got.tri) >= 0) == h).all()
    assert np.allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                       rtol=1e-5)


def test_pipeline_anyhit_vs_oracle(pipeline_scene, rng):
    _pipeline_vs_oracle(pipeline_scene, rng, any_hit=True)


def test_pipeline_count_regroup_vs_oracle(pipeline_scene, rng,
                                          monkeypatch):
    """LOUPIOTE_REGROUP=count swaps the lax.sort binning for the
    counting-scatter regroup (ops/regroup.py); results must match the
    SIMT oracle exactly like the xla backend does."""
    monkeypatch.setenv("LOUPIOTE_REGROUP", "count")
    _pipeline_vs_oracle(pipeline_scene, rng, any_hit=False)
    _pipeline_vs_oracle(pipeline_scene, rng, any_hit=True)
