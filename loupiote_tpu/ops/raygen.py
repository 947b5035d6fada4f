"""Camera ray generation (the RayPass analog, renderer.rs:444-448).

One ray per pixel from a pinhole camera whose basis is the camera-to-world
transform columns (right, up, forward — see render/camera.py). Sub-pixel
jitter comes from the caller's sampler (uniform or blue-noise).
"""

from __future__ import annotations

import jax.numpy as jnp


def generate_rays(cam_to_world: jnp.ndarray, width: int, height: int,
                  vfov: float, jitter: jnp.ndarray,
                  row_offset=0, rows: int | None = None):
    """Returns (ro, rd): ((R,3), (R,3)) with R = rows * width.

    Pixel (0, 0) is the top-left corner; rows are raveled row-major so
    reshaping to (rows, width, 3) yields an image block.
    ``jitter``: (R, 2) in [0,1) sub-pixel offsets.
    ``row_offset``/``rows``: render only the row slab
    [row_offset, row_offset + rows) of the full image — the unit of
    multi-device tile parallelism (parallel/tiles.py).
    """
    right = cam_to_world[:3, 0]
    up = cam_to_world[:3, 1]
    forward = cam_to_world[:3, 2]
    origin = cam_to_world[:3, 3]

    if rows is None:
        rows = height
    aspect = width / height
    tan_half = jnp.tan(vfov / 2.0)

    yy, xx = jnp.meshgrid(jnp.arange(rows, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    px = xx.reshape(-1) + jitter[:, 0]
    py = yy.reshape(-1) + row_offset + jitter[:, 1]

    # NDC in [-1, 1]; image y grows down, camera up grows up.
    ndc_x = (px / width) * 2.0 - 1.0
    ndc_y = 1.0 - (py / height) * 2.0

    d = (right[None, :] * (ndc_x * tan_half * aspect)[:, None]
         + up[None, :] * (ndc_y * tan_half)[:, None]
         + forward[None, :])
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.broadcast_to(origin, d.shape)
    return o, d
