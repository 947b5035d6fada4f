"""Environment probe evaluation + importance sampling.

The reference binds the equirect RGBE probe to the shading pass
(`crates/lib/src/renderer.rs:713-723`) and decodes it in-shader; here the
probe is pre-decoded float32 (scene/hdr.py) and we add CDF importance
sampling (a TPU-side capability upgrade — the dense gather model makes the
two binary searches cheap and fully vectorized).

Direction convention: standard equirect with +Y up;
u = 0.5 + atan2(d.x, -d.z) / 2pi, v = acos(clamp(d.y)) / pi.
"""

from __future__ import annotations

import jax.numpy as jnp


def dir_to_equirect(d: jnp.ndarray):
    """(R,3) unit dirs -> (u, v) in [0,1)^2."""
    u = 0.5 + jnp.arctan2(d[:, 0], -d[:, 2]) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) / jnp.pi
    return u, v


def equirect_to_dir(u: jnp.ndarray, v: jnp.ndarray):
    theta = v * jnp.pi
    phi = (u - 0.5) * 2.0 * jnp.pi
    sin_t = jnp.sin(theta)
    return jnp.stack([sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)], axis=1)


def eval_env(scene, d: jnp.ndarray) -> jnp.ndarray:
    """Bilinear probe radiance lookup for directions d: (R,3) -> (R,3)."""
    h, w = scene.probe.shape[0], scene.probe.shape[1]
    u, v = dir_to_equirect(d)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = scene.probe.reshape(-1, 3)
    c00 = flat[y0i * w + x0i]
    c10 = flat[y0i * w + x1i]
    c01 = flat[y1i * w + x0i]
    c11 = flat[y1i * w + x1i]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def env_pdf(scene, d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of sampling direction d from the probe CDFs."""
    hp, wp = scene.probe_pdf.shape
    u, v = dir_to_equirect(d)
    xi = jnp.clip((u * wp).astype(jnp.int32), 0, wp - 1)
    yi = jnp.clip((v * hp).astype(jnp.int32), 0, hp - 1)
    return scene.probe_pdf.reshape(-1)[yi * wp + xi]


def sample_env(scene, u1: jnp.ndarray, u2: jnp.ndarray):
    """Importance-sample the probe. Returns (dir (R,3), pdf (R,)).

    The CDF tables are the *coarse* sampling grid built by scene/hdr.py
    (capped resolution) so the per-ray bisection below stays cheap; the pdf
    is exact w.r.t. that coarse distribution, keeping the estimator unbiased
    while radiance itself is evaluated at full probe resolution.
    """
    hp, wp = scene.probe_pdf.shape
    # Marginal row: vectorized searchsorted over the shared (Hp,) CDF.
    row = jnp.clip(jnp.searchsorted(scene.probe_cdf_marg, u1, side="left"),
                   0, hp - 1).astype(jnp.int32)
    col = jnp.clip(_bisect_rows(scene.probe_cdf_cond, row, u2), 0, wp - 1)
    u = (col.astype(jnp.float32) + 0.5) / wp
    v = (row.astype(jnp.float32) + 0.5) / hp
    d = equirect_to_dir(u, v)
    pdf = scene.probe_pdf.reshape(-1)[row * wp + col]
    return d, pdf


def _bisect_rows(cdf_cond: jnp.ndarray, row: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """First index i per ray with cdf_cond[row, i] >= u, via log2(W) gathers."""
    h, w = cdf_cond.shape
    flat = cdf_cond.reshape(-1)
    base = row * w
    lo = jnp.zeros_like(row)
    hi = jnp.full_like(row, w)
    steps = max(1, int(jnp.ceil(jnp.log2(max(w, 2)))))
    for _ in range(steps):
        mid = (lo + hi) // 2
        val = flat[base + jnp.minimum(mid, w - 1)]
        go_right = val < u
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo
