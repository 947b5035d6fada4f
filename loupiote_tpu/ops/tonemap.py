"""Tonemap + display transforms (the BlitPass analog, renderer.rs:551-607).

The reference blit draws the accumulated HDR target through a tonemapping
fragment shader to the sRGB swapchain (kernel unmounted). We provide linear
clamp, Reinhard, and ACES-approx (Narkowicz 2015) curves with sRGB encode;
ACES is the default display transform.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.power(jnp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055)


def tonemap_aces(c: jnp.ndarray) -> jnp.ndarray:
    a, b, c2, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = jnp.maximum(c, 0.0)
    return jnp.clip((x * (a * x + b)) / (x * (c2 * x + d) + e), 0.0, 1.0)


def tonemap_reinhard(c: jnp.ndarray) -> jnp.ndarray:
    x = jnp.maximum(c, 0.0)
    return x / (1.0 + x)


_CURVES = {
    "linear": lambda c: jnp.clip(c, 0.0, 1.0),
    "reinhard": tonemap_reinhard,
    "aces": tonemap_aces,
}


def to_display(hdr: jnp.ndarray, curve: str = "aces") -> jnp.ndarray:
    """HDR (..., 3) linear -> (..., 3) uint8 sRGB."""
    ldr = linear_to_srgb(_CURVES[curve](hdr))
    return (ldr * 255.0 + 0.5).astype(jnp.uint8)
