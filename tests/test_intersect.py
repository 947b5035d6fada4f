"""Vectorized JAX traversal vs brute-force reference."""

import numpy as np
import jax.numpy as jnp

from loupiote_tpu.ops.intersect import intersect_rays, occluded
from loupiote_tpu.scene import Scene, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh

from test_bvh import random_tris, ray_tri_brute


def scene_from_tris(v0, v1, v2):
    scene = Scene.default()
    n = len(v0)
    positions = np.empty((n * 3, 3), np.float32)
    positions[0::3] = v0
    positions[1::3] = v1
    positions[2::3] = v2
    scene.meshes.append(Mesh(positions, None, None, np.arange(n * 3, dtype=np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    return build_scene_buffers(scene)


def test_intersect_matches_brute(rng):
    n = 200
    v0, v1, v2 = random_tris(rng, n, spread=8.0, size=1.0)
    bufs = scene_from_tris(v0, v1, v2)

    m = 256
    ro = ((rng.random((m, 3)) - 0.5) * 25).astype(np.float32)
    targets = (v0[rng.integers(0, n, m)] + v1[rng.integers(0, n, m)]) / 2
    rd = np.where(rng.random((m, 1)) < 0.5,
                  targets - ro, rng.random((m, 3)) - 0.5).astype(np.float32)
    rd = rd / np.linalg.norm(rd, axis=1, keepdims=True)

    hit = intersect_rays(bufs, jnp.asarray(ro), jnp.asarray(rd))
    t_bvh = np.asarray(hit.t)

    for i in range(m):
        t_ref, _ = ray_tri_brute(ro[i], rd[i], v0, v1, v2)
        if np.isinf(t_ref):
            assert t_bvh[i] > 1e29, i
        else:
            assert abs(t_bvh[i] - t_ref) < 1e-3, (i, t_bvh[i], t_ref)


def test_occlusion(rng):
    # Single unit quad at z=0 spanning [-1,1]^2.
    v0 = np.array([[-1, -1, 0], [1, 1, 0]], np.float32)
    v1 = np.array([[1, -1, 0], [-1, 1, 0]], np.float32)
    v2 = np.array([[1, 1, 0], [-1, -1, 0]], np.float32)
    bufs = scene_from_tris(v0, v1, v2)

    ro = np.array([[0, 0, -2], [0, 0, -2], [3, 3, -2]], np.float32)
    rd = np.array([[0, 0, 1], [0, 0, -1], [0, 0, 1]], np.float32)
    dist = np.array([5.0, 5.0, 5.0], np.float32)
    blocked = np.asarray(occluded(bufs, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(dist)))
    assert blocked.tolist() == [True, False, False]

    # Distance shorter than the blocker -> unoccluded.
    dist2 = np.array([1.0, 1.0, 1.0], np.float32)
    blocked2 = np.asarray(occluded(bufs, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(dist2)))
    assert blocked2.tolist() == [False, False, False]


def test_active_mask(rng):
    v0, v1, v2 = random_tris(rng, 20, spread=2.0, size=2.0)
    bufs = scene_from_tris(v0, v1, v2)
    ro = np.zeros((8, 3), np.float32) + np.array([0, 0, -10], np.float32)
    rd = np.tile(np.array([[0, 0, 1]], np.float32), (8, 1))
    active = np.array([True, False] * 4)
    hit = intersect_rays(bufs, jnp.asarray(ro), jnp.asarray(rd), active=jnp.asarray(active))
    t = np.asarray(hit.t)
    assert (t[1::2] > 1e29).all()
