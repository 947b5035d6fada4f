"""Texture-atlas sampling (the RTSurfaceBindGroupLayout atlas path).

The reference binds the packed atlas texture + per-texture block table to the
shading pass and samples base-color / metallic-roughness maps per hit
(`crates/lib/src/renderer.rs:713-723`, `scene.rs:172-184`). Here the atlas is
a (layers, S, S, 4) uint8 array in HBM; lookups are plain gathers with
bilinear filtering in-register.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def sample_atlas(scene, tex_id: jnp.ndarray, uv: jnp.ndarray,
                 srgb: bool = False) -> jnp.ndarray:
    """Bilinear RGBA fetch. tex_id: (R,) int32 (<0 -> white), uv: (R,2).

    UVs wrap (repeat addressing, the glTF default).
    """
    layers, s = scene.atlas.shape[0], scene.atlas.shape[1]
    safe_id = jnp.maximum(tex_id, 0)
    blk = scene.atlas_blocks[safe_id]  # (R, 5): x, y, layer, w, h
    bx = blk[:, 0].astype(jnp.float32)
    by = blk[:, 1].astype(jnp.float32)
    layer = blk[:, 2]
    bw = jnp.maximum(blk[:, 3].astype(jnp.float32), 1.0)
    bh = jnp.maximum(blk[:, 4].astype(jnp.float32), 1.0)

    uu = uv[:, 0] - jnp.floor(uv[:, 0])
    vv = uv[:, 1] - jnp.floor(uv[:, 1])
    x = uu * bw - 0.5
    y = vv * bh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def fetch(xi, yi):
        # Wrap within the block, then offset into the atlas page.
        xi = jnp.mod(xi, bw).astype(jnp.int32) + bx.astype(jnp.int32)
        yi = jnp.mod(yi, bh).astype(jnp.int32) + by.astype(jnp.int32)
        flat = scene.atlas.reshape(-1, 4)
        idx = (layer * s + yi) * s + xi
        return flat[idx].astype(jnp.float32) * (1.0 / 255.0)

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    rgba = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)
    if srgb:
        rgba = rgba.at[:, :3].set(srgb_to_linear(rgba[:, :3]))
    white = jnp.ones_like(rgba)
    return jnp.where((tex_id >= 0)[:, None], rgba, white)
