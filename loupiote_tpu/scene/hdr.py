"""Radiance RGBE (.hdr) decoding + environment-probe preprocessing.

The reference uploads the raw RGBE8 bytes of the equirect probe as an
``Rgba8Unorm`` texture and decodes RGBE in-shader
(`crates/lib/src/scene.rs:66-121`, `crates/standalone/src/app.rs:139-155`).
TPU-first: decode once on the host to float32 radiance and additionally
precompute the luminance CDF tables used for environment importance
sampling — a capability upgrade the dense TPU model gets for free.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """Decode (..., 4) uint8 RGBE to (..., 3) float32 radiance."""
    rgbe = rgbe.astype(np.float32)
    e = rgbe[..., 3]
    scale = np.where(e > 0.0, np.exp2(e - (128.0 + 8.0)), 0.0)
    return rgbe[..., :3] * scale[..., None]


def float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    """Encode (..., 3) float32 to (..., 4) uint8 RGBE (for tests/round-trip)."""
    maxc = rgb.max(axis=-1)
    valid = maxc >= 1e-32
    _, exp = np.frexp(np.maximum(maxc, 1e-32))  # maxc = m * 2^exp, m in [0.5,1)
    scale = np.where(valid, np.exp2(-exp.astype(np.float64) + 8.0), 0.0)
    mant = np.clip(np.rint(rgb * scale[..., None]), 0, 255).astype(np.uint8)
    e = np.where(valid, exp + 128, 0).astype(np.uint8)
    return np.concatenate([mant, e[..., None]], axis=-1)


def read_hdr(path_or_bytes) -> np.ndarray:
    """Read a Radiance .hdr file -> (H, W, 3) float32 linear radiance."""
    import imageio.v3 as iio

    arr = iio.imread(path_or_bytes)
    if arr.dtype != np.float32:
        arr = arr.astype(np.float32)
    if arr.ndim == 3 and arr.shape[2] == 4:
        arr = arr[..., :3]
    return np.ascontiguousarray(arr)


@dataclass
class Probe:
    """Equirect environment probe + luminance CDFs for importance sampling.

    The CDF/pdf tables live on a *coarse* grid (capped at ``SAMPLE_RES``) so
    per-ray CDF bisection in ops/env.py stays cheap; radiance remains full
    resolution. Sampling from the coarse distribution with its own exact pdf
    keeps the estimator unbiased.
    """

    radiance: np.ndarray  # (H, W, 3) float32
    cdf_cond: np.ndarray  # (Hc, Wc) float32: per-row conditional CDF
    cdf_marg: np.ndarray  # (Hc,) float32: marginal CDF over rows
    pdf: np.ndarray  # (Hc, Wc) float32: solid-angle pdf (per coarse texel)

    @property
    def width(self) -> int:
        return self.radiance.shape[1]

    @property
    def height(self) -> int:
        return self.radiance.shape[0]


SAMPLE_RES = (64, 128)  # (Hc, Wc) cap for the sampling grid


def build_probe(radiance: np.ndarray, sample_res=SAMPLE_RES) -> Probe:
    h, w = radiance.shape[:2]
    lum = (0.2126 * radiance[..., 0] + 0.7152 * radiance[..., 1]
           + 0.0722 * radiance[..., 2]).astype(np.float64)

    hc, wc = min(h, sample_res[0]), min(w, sample_res[1])
    if (hc, wc) != (h, w):
        import cv2

        lum_c = cv2.resize(lum, (wc, hc), interpolation=cv2.INTER_AREA)
    else:
        lum_c = lum

    # sin(theta) weight for equirect solid-angle measure.
    theta = (np.arange(hc, dtype=np.float64) + 0.5) / hc * np.pi
    weight = lum_c * np.sin(theta)[:, None]
    weight = np.maximum(weight, 1e-12)

    row_sum = weight.sum(axis=1)
    cdf_cond = np.cumsum(weight, axis=1) / row_sum[:, None]
    cdf_marg = np.cumsum(row_sum) / row_sum.sum()

    # pdf over the coarse (u, v) texel grid in solid-angle measure:
    # p(dir) = p(u,v) / (2 pi^2 sin(theta))
    p_uv = weight / weight.sum() * (hc * wc)
    sin_t = np.maximum(np.sin(theta), 1e-8)
    pdf = p_uv / (2.0 * np.pi * np.pi * sin_t[:, None])

    return Probe(
        radiance=radiance.astype(np.float32),
        cdf_cond=cdf_cond.astype(np.float32),
        cdf_marg=cdf_marg.astype(np.float32),
        pdf=pdf.astype(np.float32),
    )


def load_probe(path: str) -> Probe:
    return build_probe(read_hdr(path))
