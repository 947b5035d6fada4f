"""A-SVGF unit tests: reprojection validity, wavelet normalization,
edge preservation, variance reduction."""

import jax.numpy as jnp
import numpy as np

from loupiote_tpu.denoise.asvgf import (atrous_filter, denoise,
                                        temporal_reproject)

H = W = 32


def flat_gbuffer(mesh_id=0, depth=5.0):
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 1))
    depth_img = jnp.full((H, W), depth)
    mesh = jnp.full((H, W), mesh_id, jnp.int32)
    return normal, depth_img, mesh


def test_temporal_static_accumulates_history():
    n, z, m = flat_gbuffer()
    motion = jnp.zeros((H, W, 2))
    illum = jnp.ones((H, W, 3))
    prev_illum = jnp.ones((H, W, 3))
    prev_moments = jnp.stack([jnp.ones((H, W)), jnp.ones((H, W))], -1)
    prev_history = jnp.full((H, W), 5.0)
    out = temporal_reproject(illum, motion, n, z, m, n, z, m,
                             prev_illum, prev_moments, prev_history)
    np.testing.assert_allclose(np.asarray(out.history), 6.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.illum), 1.0, atol=1e-5)
    # Constant signal -> zero variance (history >= 4 -> temporal variance).
    np.testing.assert_allclose(np.asarray(out.variance), 0.0, atol=1e-4)


def test_temporal_rejects_mesh_mismatch():
    n, z, m = flat_gbuffer(mesh_id=1)
    _, _, m_prev = flat_gbuffer(mesh_id=2)
    motion = jnp.zeros((H, W, 2))
    illum = jnp.full((H, W, 3), 2.0)
    prev = jnp.zeros((H, W, 3))
    prev_m = jnp.zeros((H, W, 2))
    prev_h = jnp.full((H, W), 30.0)
    out = temporal_reproject(illum, motion, n, z, m, n, z, m_prev,
                             prev, prev_m, prev_h)
    # Disocclusion: history resets to 1, current sample passes through.
    np.testing.assert_allclose(np.asarray(out.history), 1.0)
    np.testing.assert_allclose(np.asarray(out.illum), 2.0, atol=1e-5)


def test_temporal_reprojects_translation():
    n, z, m = flat_gbuffer()
    # Previous content shifted: pixel p came from p + 4 pixels in x.
    motion = jnp.zeros((H, W, 2)).at[..., 0].set(4.0 / W)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    prev_illum = jnp.stack([xx, xx, xx], -1)
    prev_m = jnp.zeros((H, W, 2))
    prev_h = jnp.full((H, W), 10.0)
    curr = jnp.zeros((H, W, 3))
    out = temporal_reproject(curr, motion, n, z, m, n, z, m,
                             prev_illum, prev_m, prev_h)
    # Interior pixels: blended value ~= (1-alpha) * (x + 4).
    got = np.asarray(out.illum[:, 8:-8, 0])
    expect = (np.arange(W, dtype=np.float32)[8:-8] + 4.0) * (1 - 1.0 / 11.0)
    np.testing.assert_allclose(got, expect[None, :].repeat(H, 0), rtol=0.02)


def test_atrous_preserves_constant():
    n, z, m = flat_gbuffer()
    illum = jnp.full((H, W, 3), 0.7)
    var = jnp.full((H, W), 0.1)
    out = atrous_filter(illum, var, n, z, m, iterations=4)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)


def test_atrous_smooths_noise():
    rng = np.random.default_rng(0)
    n, z, m = flat_gbuffer()
    noisy = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    var = jnp.full((H, W), 0.3)
    out = np.asarray(atrous_filter(noisy, var, n, z, m, iterations=4))
    assert out.std() < 0.3 * np.asarray(noisy).std()
    # Mean brightness preserved (normalized weights).
    assert abs(out.mean() - np.asarray(noisy).mean()) < 0.05


def test_atrous_respects_mesh_edges():
    n, z, _ = flat_gbuffer()
    mesh = jnp.zeros((H, W), jnp.int32).at[:, W // 2:].set(1)
    illum = jnp.zeros((H, W, 3)).at[:, W // 2:].set(1.0)
    var = jnp.full((H, W), 0.5)
    out = np.asarray(atrous_filter(illum, var, n, z, mesh, iterations=4))
    # The step edge survives: left stays ~0, right stays ~1.
    assert out[:, : W // 2 - 1].max() < 1e-4
    assert out[:, W // 2 + 1:].min() > 1.0 - 1e-4


def test_denoise_reduces_error():
    rng = np.random.default_rng(1)
    n, z, m = flat_gbuffer()
    albedo = jnp.full((H, W, 3), 0.8)
    truth = 0.5
    motion = jnp.zeros((H, W, 2))
    prev_i = jnp.zeros((H, W, 3))
    prev_m = jnp.zeros((H, W, 2))
    prev_h = jnp.zeros((H, W))
    raw_err = None
    for frame in range(8):
        noisy = truth + rng.normal(0, 0.25, (H, W, 3)).astype(np.float32)
        noisy = jnp.asarray(np.maximum(noisy, 0.0))
        out, t = denoise(noisy, albedo, motion, n, z, m, n, z, m,
                         prev_i, prev_m, prev_h, iterations=4)
        prev_i, prev_m, prev_h = t.illum, t.moments, t.history
        if frame == 0:
            raw_err = float(jnp.abs(noisy - truth).mean())
    final_err = float(jnp.abs(out - truth).mean())
    assert final_err < 0.25 * raw_err
