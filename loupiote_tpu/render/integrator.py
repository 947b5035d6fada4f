"""Path-tracing integrator: raygen -> [intersect -> shade] x bounces.

This is the TPU-native replacement for the reference's per-frame dispatch
sequence (`crates/lib/src/renderer.rs:392-549`): RayPass, IntersectorPass,
PrimaryRayPass (bounce 0 + G-buffer/motion), then the
IntersectorPass/ShadingPass wavefront loop. Here the whole frame is one
jitted pure function over SoA ray batches; the bounce loop is a static
Python loop (bounce count is a compile-time constant, = 3 in the reference).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

from ..ops.intersect import intersect_any
from ..ops.raygen import generate_rays
from ..ops.shade import BounceState, decode_surface, shade_step

# Pixel tile used to form spatially coherent ray packets (ops/intersect.py):
# 8 rows x 128 cols = one packet = one f32 VREG tile.
TILE_H, TILE_W = 8, 128


def _tile_perm(width: int, rows: int):
    """Permutation j -> pixel index putting 8x128 tiles contiguous.

    Returns (perm, inv) as numpy int32, or (None, None) when the image
    doesn't tile evenly (callers fall back to row-major packets).
    """
    if width % TILE_W or rows % TILE_H:
        return None, None
    j = np.arange(width * rows, dtype=np.int32)
    tiles_x = width // TILE_W
    tile_id, within = j // (TILE_H * TILE_W), j % (TILE_H * TILE_W)
    ty, tx = tile_id // tiles_x, tile_id % tiles_x
    yy, xx = within // TILE_W, within % TILE_W
    perm = (ty * TILE_H + yy) * width + (tx * TILE_W + xx)
    inv = np.empty_like(perm)
    inv[perm] = j
    return perm, inv


class GBuffer(NamedTuple):
    """First-bounce aux output (PrimaryRayPass analog, renderer.rs:466-481)."""

    normal: jnp.ndarray  # (R,3) shading normal (0 on miss)
    depth: jnp.ndarray  # (R,) hit distance (T_FAR on miss)
    mesh_id: jnp.ndarray  # (R,) int32 instance id (-1 on miss)
    albedo: jnp.ndarray  # (R,3) surface albedo for SVGF demodulation
    world_pos: jnp.ndarray  # (R,3) hit position (for motion vectors)


def trace_paths(scene, cam_to_world: jnp.ndarray, width: int, height: int,
                key, bounces: int = 3, vfov: float = 0.7853982,
                nee: bool = True, jitter: jnp.ndarray | None = None,
                row_offset=0, rows: int | None = None,
                sort_rays: bool = True):
    """Trace one sample per pixel. Returns (radiance (R,3), GBuffer).

    ``row_offset``/``rows`` select a horizontal slab of the image — the unit
    of multi-device tile parallelism (parallel/tiles.py shards rows over the
    device mesh; each shard traces its slab with a private RNG fold).

    ``sort_rays``: re-sort live rays by direction-octant + origin-Morton
    between bounces (ops/sort.py) so secondary waves stay packet-coherent
    and dead rays compact into instantly-retiring tiles.
    """
    if rows is None:
        rows = height
    R = width * rows
    k_jit, k_bounce = jax.random.split(key)
    if jitter is None:
        jitter = jax.random.uniform(k_jit, (R, 2))
    ro, rd = generate_rays(cam_to_world, width, height, vfov, jitter,
                           row_offset=row_offset, rows=rows)

    # Reorder rays into spatially coherent tiles so packets share traversal
    # paths; all bounce state lives in tile order, outputs unpermute at the
    # end (RNG is position-independent so this is behavior-neutral).
    perm, inv = _tile_perm(width, rows)
    if perm is not None:
        perm_j = jnp.asarray(perm)
        ro, rd = ro[perm_j], rd[perm_j]

    state = BounceState(
        ro=ro, rd=rd,
        throughput=jnp.ones((R, 3)),
        radiance=jnp.zeros((R, 3)),
        alive=jnp.ones(R, jnp.bool_),
        bsdf_pdf=jnp.zeros(R),
        use_mis=jnp.zeros(R, jnp.bool_),
    )

    # Slot -> original pixel mapping, updated by inter-bounce sorts.
    pixel_of_slot = (jnp.asarray(perm) if perm is not None
                     else jnp.arange(R, dtype=jnp.int32))

    gbuffer = None
    scene_lo = scene.node_min[0]
    scene_hi = scene.node_max[0]
    for bounce in range(bounces):
        hit = intersect_any(scene, state.ro, state.rd, active=state.alive)
        if bounce == 0:
            surf0 = decode_surface(scene, state.ro, state.rd, hit)
            missed = hit.tri < 0
            gbuffer = GBuffer(
                normal=jnp.where(missed[:, None], 0.0, surf0.n_shade),
                depth=hit.t,
                mesh_id=jnp.where(missed, -1, surf0.inst_id),
                albedo=jnp.where(missed[:, None], 1.0, surf0.albedo),
                world_pos=surf0.pos,
            )
        k_bounce, k_step = jax.random.split(k_bounce)
        state, _ = shade_step(scene, state, hit, k_step, nee=nee)

        if sort_rays and bounce < bounces - 1:
            from ..ops.sort import ray_sort_key, sort_order

            order = sort_order(ray_sort_key(state.ro, state.rd, state.alive,
                                            scene_lo, scene_hi))
            state = jax.tree.map(lambda x: x[order], state)
            pixel_of_slot = pixel_of_slot[order]

    # Scatter per-slot radiance back to pixel order.
    radiance = jnp.zeros_like(state.radiance).at[pixel_of_slot].set(state.radiance)
    if perm is not None:
        inv_j = jnp.asarray(inv)
        gbuffer = GBuffer(*(f[inv_j] for f in gbuffer))

    return radiance, gbuffer


def accumulate(accum: jnp.ndarray, sample: jnp.ndarray,
               frame_count: jnp.ndarray) -> jnp.ndarray:
    """Progressive running average (AccumulationPass analog,
    renderer.rs:523-537): out = lerp(accum, sample, 1/frame_count)."""
    w = 1.0 / jnp.maximum(frame_count.astype(jnp.float32), 1.0)
    return accum + (sample - accum) * w
