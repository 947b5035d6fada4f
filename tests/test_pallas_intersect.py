"""Pallas traversal kernel vs the reference SIMT traversal (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from loupiote_tpu.ops.intersect import intersect_rays
from loupiote_tpu.ops.pallas_intersect import TILE, intersect_pallas
from loupiote_tpu.scene import Scene, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh

from test_bvh import random_tris


@pytest.fixture(scope="module")
def tri_scene():
    rng = np.random.default_rng(1234)  # own stream: order-independent
    n = 300
    v0, v1, v2 = random_tris(rng, n, spread=10.0, size=1.0)
    scene = Scene.default()
    pos = np.empty((n * 3, 3), np.float32)
    pos[0::3], pos[1::3], pos[2::3] = v0, v1, v2
    scene.meshes.append(Mesh(pos, None, None, np.arange(n * 3, dtype=np.uint32)))
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


def test_pallas_matches_simt(tri_scene):
    bufs, tris = tri_scene
    ro, rd = _rays(tris, TILE)
    ref = intersect_rays(bufs, ro, rd)
    out = intersect_pallas(bufs, ro, rd, interpret=True)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), rtol=1e-4)
    # Triangle ids must match except where two triangles tie on t (shared
    # edges / coplanar overlap): there either winner is a correct answer.
    tri_ref, tri_out = np.asarray(ref.tri), np.asarray(out.tri)
    mismatch = tri_ref != tri_out
    assert mismatch.mean() < 0.005
    same_tri = ~mismatch
    np.testing.assert_allclose(np.asarray(out.u)[same_tri],
                               np.asarray(ref.u)[same_tri], atol=1e-4)


def test_pallas_anyhit_matches(tri_scene):
    bufs, tris = tri_scene
    ro, rd = _rays(tris, TILE, seed=78)
    dist = jnp.full(TILE, 5.0)
    ref = intersect_rays(bufs, ro, rd, tmax=dist, any_hit=True)
    out = intersect_pallas(bufs, ro, rd, tmax=dist, any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.tri) >= 0,
                                  np.asarray(ref.tri) >= 0)


def test_pallas_active_mask(tri_scene):
    bufs, tris = tri_scene
    ro, rd = _rays(tris, TILE, seed=79)
    active = jnp.asarray(np.random.default_rng(80).random(TILE) < 0.5)
    out = intersect_pallas(bufs, ro, rd, active=active, interpret=True)
    tri = np.asarray(out.tri)
    assert (tri[~np.asarray(active)] == -1).all()
    ref = intersect_rays(bufs, ro, rd)
    act = np.asarray(active)
    np.testing.assert_array_equal(tri[act], np.asarray(ref.tri)[act])


def test_pallas_sub32_and_ragged_rows(tri_scene):
    """Exercise the shipped DEFAULT_SUB=32 path (4*TILE rays = one sub=32
    grid cell) and the clamp arithmetic on a non-power-of-two row count
    (24 rows = 3072 rays -> clamps sub to 24), both vs intersect_rays.
    Unit tests elsewhere use R=TILE which always clamps back to sub=8;
    without this test sub=32 correctness rests only on device perf runs."""
    from loupiote_tpu.ops.pallas_intersect import SUBP, _sub_rows

    bufs, tris = tri_scene
    for R, want_sub in ((4 * TILE, 32), (24 * SUBP, 24)):
        assert _sub_rows(32, R) == want_sub
        ro, rd = _rays(tris, R, seed=83)
        ref = intersect_rays(bufs, ro, rd)
        out = intersect_pallas(bufs, ro, rd, interpret=True, sub=32)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   rtol=1e-4)
        tri_ref, tri_out = np.asarray(ref.tri), np.asarray(out.tri)
        assert (tri_ref != tri_out).mean() < 0.005


def test_anyhit_stackless_kernel_matches(tri_scene):
    """The specialized stackless shadow kernel (occluded_pallas) agrees with
    the SIMT oracle's any-hit semantics for bounded and unbounded rays."""
    from loupiote_tpu.ops.pallas_intersect import occluded_pallas

    bufs, tris = tri_scene
    ro, rd = _rays(tris, TILE, seed=81)
    for dval in (3.0, 1e30):
        dist = jnp.full(TILE, dval)
        ref = intersect_rays(bufs, ro, rd, tmax=dist, any_hit=True)
        out = occluded_pallas(bufs, ro, rd, dist, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(ref.tri) >= 0)

    # Active mask: inactive rays always unoccluded.
    active = jnp.asarray(np.random.default_rng(82).random(TILE) < 0.5)
    out = occluded_pallas(bufs, ro, rd, jnp.full(TILE, 5.0), active=active,
                          interpret=True)
    assert not np.asarray(out)[~np.asarray(active)].any()
