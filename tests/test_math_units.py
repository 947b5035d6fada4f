"""Small-math unit tests: raygen geometry, tonemap, projection, sort keys,
sampling distributions."""

import jax.numpy as jnp
import numpy as np

from loupiote_tpu.ops.raygen import generate_rays
from loupiote_tpu.ops.sampling import (cosine_sample_hemisphere,
                                       orthonormal_basis, power_heuristic,
                                       sample_ggx_vndf, to_world)
from loupiote_tpu.ops.sort import direction_octant, morton3, ray_sort_key
from loupiote_tpu.ops.tonemap import linear_to_srgb, to_display, tonemap_aces
from loupiote_tpu.render.camera import Camera


def test_raygen_geometry():
    cam = np.eye(4, dtype=np.float32)
    cam[:3, 2] = [0, 0, -1]  # forward -z
    w = h = 8
    jitter = jnp.full((w * h, 2), 0.5)
    ro, rd = generate_rays(jnp.asarray(cam), w, h, np.deg2rad(90.0), jitter)
    ro, rd = np.asarray(ro), np.asarray(rd)
    np.testing.assert_allclose(ro, 0.0)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=1), 1.0, atol=1e-6)
    # Center of the image looks straight down -z.
    center = rd.reshape(h, w, 3)[h // 2, w // 2]
    # (pixel center at (4.5, 4.5) of 8 -> slight offset) top-left looks up-left.
    tl = rd.reshape(h, w, 3)[0, 0]
    assert tl[0] < 0 and tl[1] > 0 and tl[2] < 0
    br = rd.reshape(h, w, 3)[-1, -1]
    assert br[0] > 0 and br[1] < 0
    assert center[2] < -0.9


def test_row_offset_slab_equals_full():
    cam = np.eye(4, dtype=np.float32)
    cam[:3, 2] = [0, 0, -1]
    w, h = 16, 16
    jitter_full = jnp.full((w * h, 2), 0.25)
    _, rd_full = generate_rays(jnp.asarray(cam), w, h, 0.8, jitter_full)
    jitter_slab = jnp.full((w * 4, 2), 0.25)
    _, rd_slab = generate_rays(jnp.asarray(cam), w, h, 0.8, jitter_slab,
                               row_offset=8, rows=4)
    np.testing.assert_allclose(np.asarray(rd_slab),
                               np.asarray(rd_full).reshape(h, w, 3)[8:12]
                               .reshape(-1, 3), atol=1e-6)


def test_camera_world_to_screen_roundtrip():
    cam = Camera(np.eye(4, dtype=np.float32), (64, 64))
    m = cam.world_to_screen()
    # A point straight ahead along +forward (=+z column of identity... the
    # camera looks along +forward = +z here) projects to NDC center.
    p = np.array([0, 0, 5.0, 1.0], np.float32)
    clip = m @ p
    ndc = clip[:2] / clip[3]
    np.testing.assert_allclose(ndc, 0.0, atol=1e-5)
    assert clip[3] > 0  # in front


def test_tonemap_ranges():
    x = jnp.asarray([0.0, 0.18, 1.0, 10.0])
    y = np.asarray(tonemap_aces(x))
    assert y[0] == 0.0 and (np.diff(y) > 0).all() and y[-1] <= 1.0
    s = np.asarray(linear_to_srgb(jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(s, [0.0, 1.0], atol=1e-6)
    img = to_display(jnp.full((2, 2, 3), 0.5), "aces")
    assert img.dtype == np.uint8


def test_cosine_hemisphere_distribution():
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.random(20000))
    u2 = jnp.asarray(rng.random(20000))
    d = np.asarray(cosine_sample_hemisphere(u1, u2))
    assert (d[:, 2] >= 0).all()
    # E[cos theta] = 2/3 for cosine-weighted.
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_onb_and_vndf():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(512, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = jnp.asarray(n.astype(np.float32))
    t, bt = orthonormal_basis(n)
    for a, b in ((t, bt), (t, n), (bt, n)):
        dots = np.abs(np.asarray(jnp.sum(a * b, axis=1)))
        assert dots.max() < 1e-5
    # VNDF half-vectors stay in the upper local hemisphere.
    wo = jnp.tile(jnp.asarray([[0.3, -0.2, 0.93]]), (512, 1))
    wo = wo / jnp.linalg.norm(wo, axis=1, keepdims=True)
    h = np.asarray(sample_ggx_vndf(wo, jnp.full(512, 0.3),
                                   jnp.asarray(rng.random(512)),
                                   jnp.asarray(rng.random(512))))
    assert (h[:, 2] > 0).all()
    # to_world of +z == n.
    up = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (512, 1))
    np.testing.assert_allclose(np.asarray(to_world(n, t, bt, up)),
                               np.asarray(n), atol=1e-5)


def test_power_heuristic_bounds():
    a = jnp.asarray([1.0, 10.0, 0.0])
    b = jnp.asarray([1.0, 1.0, 5.0])
    w = np.asarray(power_heuristic(a, b))
    assert (w >= 0).all() and (w <= 1).all()
    assert abs(w[0] - 0.5) < 1e-6
    assert w[1] > 0.98 and w[2] == 0.0


def test_sort_keys():
    lo = jnp.zeros(3)
    hi = jnp.ones(3) * 10
    p = jnp.asarray([[1.0, 1, 1], [1.01, 1, 1], [9, 9, 9]])
    d = jnp.asarray([[1.0, 1, 1], [1, 1, 1], [-1, -1, -1]])
    alive = jnp.asarray([True, True, False])
    k = np.asarray(ray_sort_key(p, d, alive, lo, hi))
    assert k[0] == k[1] or abs(int(k[0]) - int(k[1])) < 8  # near points cluster
    assert k[2] == 0xFFFFFFFF  # dead last
    o = np.asarray(direction_octant(d))
    assert o[0] == 0b111 and o[2] == 0
    m = np.asarray(morton3(p, lo, hi))
    assert m[2] > m[0]
