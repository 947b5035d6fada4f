"""A-SVGF denoiser: temporal reprojection + a-trous wavelet + compositing.

Reference: the ASVGF driver owns ping-pong {radiance, gbuffer, moments,
history} + shared motion + temp radiance, and dispatches
TemporalAccumulationPass -> ATrousPass (even iteration count) ->
CompositingPass per frame (`crates/lib/src/render/asvgf.rs:9-152,250-291`,
driven from `renderer.rs:466-481,512-521`). Kernels are unmounted; semantics
follow the SVGF family (Schied et al. 2017): moment-based variance guides an
edge-aware wavelet filter over *demodulated* illumination, and compositing
re-multiplies surface albedo.

TPU-native shape: everything is (H, W, C) image math — shifted adds and
elementwise ops that XLA fuses into a handful of HBM-bandwidth-bound loops.
Functional ping-pong: previous-frame state comes in, new state goes out.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Temporal blend floor: history is capped so fresh samples always contribute.
ALPHA_MIN = 0.05
MAX_HISTORY = 32.0
# Edge-stopping parameters (SVGF defaults).
SIGMA_NORMAL = 64.0
SIGMA_DEPTH = 1.0
SIGMA_LUM = 4.0


class TemporalOut(NamedTuple):
    illum: jnp.ndarray  # (H, W, 3) integrated illumination
    moments: jnp.ndarray  # (H, W, 2) integrated (mu1, mu2) of luminance
    history: jnp.ndarray  # (H, W) float32 history length
    variance: jnp.ndarray  # (H, W) luminance variance estimate


def _luminance(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


def demodulate(radiance, albedo):
    """Split illumination from surface albedo for filtering."""
    return radiance / jnp.maximum(albedo, 1e-3)


def modulate(illum, albedo):
    """CompositingPass analog: re-apply albedo (asvgf.rs:286-290)."""
    return illum * jnp.maximum(albedo, 1e-3)


def temporal_reproject(curr_illum, motion, curr_normal, curr_depth, curr_mesh,
                       prev_normal, prev_depth, prev_mesh,
                       prev_illum, prev_moments, prev_history) -> TemporalOut:
    """TemporalAccumulationPass analog (asvgf.rs:186-207).

    Reprojects the previous frame's integrated illumination/moments through
    the motion vectors with a validity-checked bilinear tap (mesh id, depth
    and normal consistency), then blends the current 1-spp sample in with an
    alpha driven by history length.
    """
    h, w = curr_depth.shape

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # motion is uv_prev - uv_curr in [0,1] units (render/renderer.py).
    px = xx + motion[..., 0] * w
    py = yy + motion[..., 1] * h

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0

    # Pack everything reprojection reads into ONE (H*W, 11) array so each
    # bilinear tap is a single row gather (TPU gathers cost ~per-row).
    prev_pack = jnp.concatenate([
        prev_illum,                      # 0:3
        prev_moments,                    # 3:5
        prev_history[..., None],         # 5
        prev_normal,                     # 6:9
        prev_depth[..., None],           # 9
        prev_mesh.astype(jnp.float32)[..., None],  # 10
    ], axis=-1).reshape(h * w, 11)

    n_dot_min = 0.9
    illum_acc = jnp.zeros_like(curr_illum)
    mom_acc = jnp.zeros(curr_depth.shape + (2,))
    hist_acc = jnp.zeros_like(curr_depth)
    w_acc = jnp.zeros_like(curr_depth)

    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (jnp.where(dx == 1, fx, 1.0 - fx)
                   * jnp.where(dy == 1, fy, 1.0 - fy))
            in_bounds = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
            yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
            tap = prev_pack[yi_c * w + xi_c]  # (H, W, 11) single gather
            p_mesh = tap[..., 10]
            p_depth = tap[..., 9]
            p_normal = tap[..., 6:9]
            same_mesh = p_mesh == curr_mesh.astype(jnp.float32)
            depth_ok = jnp.abs(p_depth - curr_depth) <= (
                0.1 * jnp.maximum(jnp.maximum(p_depth, curr_depth), 1e-3))
            normal_ok = jnp.sum(p_normal * curr_normal, axis=-1) > n_dot_min
            valid = in_bounds & same_mesh & depth_ok & normal_ok & (curr_mesh >= 0)
            wv = jnp.where(valid, wgt, 0.0)
            illum_acc = illum_acc + tap[..., 0:3] * wv[..., None]
            mom_acc = mom_acc + tap[..., 3:5] * wv[..., None]
            hist_acc = hist_acc + tap[..., 5] * wv
            w_acc = w_acc + wv

    reproj_ok = w_acc > 1e-3
    inv_w = 1.0 / jnp.maximum(w_acc, 1e-3)
    prev_i = illum_acc * inv_w[..., None]
    prev_m = mom_acc * inv_w[..., None]
    prev_h = hist_acc * inv_w

    history = jnp.where(reproj_ok, jnp.minimum(prev_h + 1.0, MAX_HISTORY), 1.0)
    alpha = jnp.maximum(1.0 / history, ALPHA_MIN)

    lum = _luminance(curr_illum)
    curr_m = jnp.stack([lum, lum * lum], axis=-1)

    illum = jnp.where(reproj_ok[..., None],
                      prev_i + (curr_illum - prev_i) * alpha[..., None],
                      curr_illum)
    moments = jnp.where(reproj_ok[..., None],
                        prev_m + (curr_m - prev_m) * alpha[..., None],
                        curr_m)

    var_temporal = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)
    # Spatial variance fallback for young pixels (standard SVGF).
    var_spatial = _spatial_variance(lum)
    variance = jnp.where(history < 4.0, var_spatial, var_temporal)

    return TemporalOut(illum, moments, history, variance)


def _shift(img, dy, dx):
    """Edge-clamped shift: img[y+dy, x+dx] with replicate padding."""
    pad_y = (max(dy, 0), max(-dy, 0))
    pad_x = (max(dx, 0), max(-dx, 0))
    pads = ((pad_y, pad_x, (0, 0)) if img.ndim == 3 else (pad_y, pad_x))
    p = jnp.pad(img, pads, mode="edge")
    h, w = img.shape[0], img.shape[1]
    return p[pad_y[1]:pad_y[1] + h, pad_x[1]:pad_x[1] + w]


def _spatial_variance(lum):
    """3x3 mean/second-moment luminance variance."""
    s1 = jnp.zeros_like(lum)
    s2 = jnp.zeros_like(lum)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = _shift(lum, dy, dx)
            s1 = s1 + v
            s2 = s2 + v * v
    m1 = s1 / 9.0
    m2 = s2 / 9.0
    return jnp.maximum(m2 - m1 * m1, 0.0)


_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def atrous_iteration(illum, variance, normal, depth, mesh, step: int):
    """One edge-aware 5x5 a-trous wavelet iteration (ATrousPass analog)."""
    lum_p = _luminance(illum)
    # Variance prefilter (3x3 gaussian) for stable edge weights.
    gvar = _gauss3(variance)
    sigma_l_den = SIGMA_LUM * jnp.sqrt(jnp.maximum(gvar, 0.0)) + 1e-4

    acc_i = jnp.zeros_like(illum)
    acc_v = jnp.zeros_like(variance)
    acc_w = jnp.zeros_like(variance)

    for ky, wy in enumerate(_B3):
        for kx, wx in enumerate(_B3):
            dy = (ky - 2) * step
            dx = (kx - 2) * step
            k = wy * wx
            q_illum = _shift(illum, dy, dx)
            q_var = _shift(variance, dy, dx)
            q_n = _shift(normal, dy, dx)
            q_z = _shift(depth, dy, dx)
            q_m = _shift(mesh[..., None].astype(jnp.float32), dy, dx)[..., 0]
            q_l = _luminance(q_illum)

            w_n = jnp.maximum(jnp.sum(q_n * normal, axis=-1), 0.0) ** SIGMA_NORMAL
            w_z = jnp.exp(-jnp.abs(q_z - depth)
                          / (SIGMA_DEPTH * jnp.maximum(depth, 1e-3) * step + 1e-4))
            w_l = jnp.exp(-jnp.abs(q_l - lum_p) / sigma_l_den)
            w_m = (q_m == mesh.astype(jnp.float32)).astype(jnp.float32)
            wgt = k * w_n * w_z * w_l * w_m

            acc_i = acc_i + q_illum * wgt[..., None]
            acc_v = acc_v + q_var * wgt * wgt
            acc_w = acc_w + wgt

    inv = 1.0 / jnp.maximum(acc_w, 1e-6)
    return acc_i * inv[..., None], acc_v * inv * inv


def _gauss3(x):
    k = (0.25, 0.5, 0.25)
    out = jnp.zeros_like(x)
    for ky, wy in enumerate(k):
        for kx, wx in enumerate(k):
            out = out + _shift(x, ky - 1, kx - 1) * (wy * wx)
    return out


def atrous_filter(illum, variance, normal, depth, mesh, iterations: int = 4):
    """Even number of a-trous iterations (asvgf.rs:286-287) with growing
    dilation 1, 2, 4, ..."""
    assert iterations % 2 == 0, "reference requires an even iteration count"
    out_i, out_v = illum, variance
    for i in range(iterations):
        out_i, out_v = atrous_iteration(out_i, out_v, normal, depth, mesh,
                                        step=1 << i)
    return out_i


def denoise(sample_radiance, albedo, motion,
            curr_normal, curr_depth, curr_mesh,
            prev_normal, prev_depth, prev_mesh,
            prev_illum, prev_moments, prev_history,
            iterations: int = 4):
    """Full A-SVGF frame (ASVGF::render analog, asvgf.rs:250-291).

    Returns (denoised_rgb, temporal_out) — temporal_out carries the state to
    persist for the next frame (the functional ping-pong).
    """
    illum_in = demodulate(sample_radiance, albedo)
    t = temporal_reproject(illum_in, motion, curr_normal, curr_depth,
                           curr_mesh, prev_normal, prev_depth, prev_mesh,
                           prev_illum, prev_moments, prev_history)
    filtered = atrous_filter(t.illum, t.variance, curr_normal, curr_depth,
                             curr_mesh, iterations)
    return modulate(filtered, albedo), t
