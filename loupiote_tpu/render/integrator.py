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


from ..ops.intersect import intersect_any
from ..ops.raygen import generate_rays
from ..ops.shade import BounceState, decode_surface, shade_step

# Pixel tile used to form spatially coherent ray packets (ops/intersect.py):
# 8 rows x 128 cols = one packet = one f32 VREG tile.
TILE_H, TILE_W = 8, 128


def _tiles_ok(width: int, rows: int) -> bool:
    return width % TILE_W == 0 and rows % TILE_H == 0


def to_tile_order(x: jnp.ndarray, width: int, rows: int) -> jnp.ndarray:
    """Pixel-major (R, ...) -> tile-major, as pure reshape/transpose
    (gather-free: a 2M-row permutation gather costs ~25 ms on TPU,
    a transpose is bandwidth-speed)."""
    lead = x.shape[1:]
    x = x.reshape(rows // TILE_H, TILE_H, width // TILE_W, TILE_W, *lead)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(rows * width, *lead)


def from_tile_order(x: jnp.ndarray, width: int, rows: int) -> jnp.ndarray:
    lead = x.shape[1:]
    x = x.reshape(rows // TILE_H, width // TILE_W, TILE_H, TILE_W, *lead)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(rows * width, *lead)


def _permute_packed(state, pid, order):
    """Apply the sort permutation as TWO row-major matrix gathers instead
    of one gather per state column.

    The measured frame attribution (artifacts/r5_device4/arch_trace.log)
    puts each inter-bounce sort at 183.5 ms — 20% of the 1080p frame for
    the two sorts. Most of that is 16 independent (R,) gathers all
    applying the SAME 8.3M-row permutation; packing the f32 columns into
    one (R,13) matrix (and int/bool + pid into one (R,3) i32 matrix)
    walks the random index list twice total with wide contiguous rows,
    instead of 16 times with 4-byte rows. DEFAULT after winning the
    frame-level device A/B by -233.5 ms (1840.6 -> 1607.1 ms, -12.7%,
    artifacts/r5_device5/frame_sort_cost_ab.log; bit-identical frames,
    tests/test_render.py). LOUPIOTE_PACKED_PERMUTE=0 restores the
    per-column permute for A/B.
    """
    leaves, treedef = jax.tree.flatten(state)
    fcols, icols, kinds = [], [], []
    for leaf in leaves:
        col = leaf.reshape(leaf.shape[0], -1)
        if leaf.dtype == jnp.float32:
            kinds.append(("f", col.shape[1], leaf))
            fcols.append(col)
        else:
            kinds.append(("i", col.shape[1], leaf))
            icols.append(col.astype(jnp.int32))
    icols.append(pid[:, None])
    fmat = jnp.concatenate(fcols, axis=1)[order] if fcols else None
    imat = jnp.concatenate(icols, axis=1)[order]
    out, fo, io = [], 0, 0
    for kind, w, leaf in kinds:
        if kind == "f":
            col = fmat[:, fo:fo + w]
            fo += w
        else:
            col = imat[:, io:io + w].astype(leaf.dtype)
            io += w
        out.append(col.reshape(leaf.shape))
    new_pid = imat[:, io]
    return jax.tree.unflatten(treedef, out), new_pid


def _packed_permute_on() -> bool:
    import os

    return os.environ.get("LOUPIOTE_PACKED_PERMUTE", "1") != "0"


def _sort_max() -> int:
    """Sort only the first N secondary bounces (LOUPIOTE_SORT_MAX).

    The measured attribution prices each sort at 183.5 ms; bounce-2 rays
    derive from bounce-1's already-sorted slabs, so the marginal
    coherence the second sort buys may not cover its cost. Frame-level
    A/B knob; default sorts every bounce (the shipped behavior)."""
    import os

    return int(os.environ.get("LOUPIOTE_SORT_MAX", 1 << 30))


# The slab-local Pallas payload sort (ops/slab_sort.py) as the inter-
# bounce regroup is a CLOSED negative result: despite winning primitive
# timings (10.6 vs 17.7 ns/elem) it LOST at frame level on device —
# 2010.1 ms vs 1911.7 ms argsort, with a 6x costlier compile (round-5
# window, artifacts/r5_device1/frame_sort_ab3.log; the kernel also needs
# a 100 MB scoped-VMEM budget at frame-scale payload width). The kernel
# remains for the archived treelet regroup and as a tested primitive;
# the frame regroup is XLA argsort + gathers.


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
                nee_uv: jnp.ndarray | None = None,
                row_offset=0, rows: int | None = None,
                sort_rays: bool = True,
                noise_tex: jnp.ndarray | None = None,
                frame_count: jnp.ndarray | None = None,
                spp: int = 1):
    """Trace ``spp`` samples per pixel. Returns (radiance (R,3), GBuffer).

    ``row_offset``/``rows`` select a horizontal slab of the image — the unit
    of multi-device tile parallelism (parallel/tiles.py shards rows over the
    device mesh; each shard traces its slab with a private RNG fold).

    ``sort_rays``: re-sort live rays by direction-octant + origin-Morton
    between bounces (ops/sort.py) so secondary waves stay packet-coherent
    and dead rays compact into instantly-retiring tiles.

    ``noise_tex``/``frame_count``: when set, EVERY shading dimension (light
    sampling, BSDF sampling, lobe selection, every bounce) draws from the
    blue-noise texture with per-dimension R2 rotations instead of the PRNG
    (full RadianceParameters.use_noise_texture parity,
    renderer.rs:666-673).

    ``spp``: samples per pixel traced in ONE batched wave (returned
    radiance is their mean). Batching densifies ray space, so the sorted
    secondary waves pack tighter sub-packets — measured 0.956x (spp=2) /
    0.900x (spp=4) union steps per ray on the arch-260k diffuse wave
    (experiments/spp_sim.py) — and amortizes the per-wave fixed costs.
    Sample s draws blue-noise with an effective frame index
    ``frame_count*spp + s`` so samples stay decorrelated.
    """
    if rows is None:
        rows = height
    R = width * rows
    N = spp * R
    k_jit, k_bounce = jax.random.split(key)
    tiled = _tiles_ok(width, rows)

    def tile(x):
        return to_tile_order(x, width, rows) if tiled else x

    # named_scope tokens ("raygen", "intersectN", "shadeN", "sortbN") flow
    # into HLO op metadata; app/trace_parse.py attributes fused-kernel
    # device-trace times to pass labels by them.
    with jax.named_scope("raygen"):
        if spp > 1 and noise_tex is not None:
            # Per-sample AA jitter (dim 0) at the sample's effective frame
            # index — tiling the caller's one plane would duplicate every
            # primary ray across samples.
            from .renderer import blue_noise_uv

            jitter = jnp.concatenate([
                blue_noise_uv(noise_tex, frame_count * spp + s, width,
                              height, dim=0, row_offset=row_offset,
                              rows=rows) for s in range(spp)])
        elif jitter is None:
            jitter = jax.random.uniform(k_jit, (N, 2))
        elif spp > 1 and jitter.shape[0] == R:
            jitter = jnp.tile(jitter, (spp, 1))
        parts = [generate_rays(cam_to_world, width, height, vfov,
                               jitter[s * R:(s + 1) * R],
                               row_offset=row_offset, rows=rows)
                 for s in range(spp)]
        # Reorder rays into spatially coherent 8x128 tiles so sub-packets
        # share traversal paths (a pure reshape/transpose — free); slot
        # layout is sample-major: slot = s*R + tile_pixel_index.
        ro = (tile(parts[0][0]) if spp == 1
              else jnp.concatenate([tile(p[0]) for p in parts]))
        rd = (tile(parts[0][1]) if spp == 1
              else jnp.concatenate([tile(p[1]) for p in parts]))
    if spp > 1 and noise_tex is not None:
        nee_uv = None  # rebuilt per sample by bn() at bounce 0
    if nee_uv is not None:
        nee_uv = tile(nee_uv)
        if spp > 1:
            nee_uv = jnp.tile(nee_uv, (spp, 1))

    # Dynamic inter-bounce sorting only pays off when traversal is the
    # dominant cost (large BVHs); the permutation gathers cost ~25ms per
    # 2M-row array on TPU.
    do_sort = sort_rays and scene.num_nodes > 16384

    state = BounceState(
        ro=ro, rd=rd,
        throughput=jnp.ones((N, 3)),
        radiance=jnp.zeros((N, 3)),
        alive=jnp.ones(N, jnp.bool_),
        bsdf_pdf=jnp.zeros(N),
        use_mis=jnp.zeros(N, jnp.bool_),
    )

    def bn(dim):
        from .renderer import blue_noise_uv

        planes = []
        for s in range(spp):
            fc = frame_count * spp + s if spp > 1 else frame_count
            planes.append(tile(blue_noise_uv(
                noise_tex, fc, width, height, dim=dim,
                row_offset=row_offset, rows=rows)))
        return planes[0] if spp == 1 else jnp.concatenate(planes)

    gbuffer = None
    scene_lo = scene.node_min[0]
    scene_hi = scene.node_max[0]
    # Sorted-state mode: instead of sorting rays locally inside the
    # intersect (and scattering hits back to caller order), the WHOLE
    # bounce state is permuted into octant+Morton order once per bounce.
    # Everything downstream of the sort then runs coherent — including
    # the NEE shadow wave of that bounce, which the local-sort scheme
    # left in unsorted caller order — and the scatter-back is replaced
    # by one final pixel-id scatter of the radiance.
    pid = jnp.arange(N, dtype=jnp.int32)  # sorted-slot -> original slot
    for bounce in range(bounces):
        if do_sort and 0 < bounce <= _sort_max():
            from ..ops.sort import ray_sort_key, sort_order

            with jax.named_scope(f"sortb{bounce}"):
                key = ray_sort_key(state.ro, state.rd, state.alive,
                                   scene_lo, scene_hi)
                order = sort_order(key)
                if _packed_permute_on():
                    state, pid = _permute_packed(state, pid, order)
                else:
                    state = jax.tree.map(lambda x: x[order], state)
                    pid = pid[order]
        with jax.named_scope(f"intersect{bounce}"):
            hit = intersect_any(scene, state.ro, state.rd,
                                active=state.alive)
        if bounce == 0:
            with jax.named_scope("gbuffer"):
                # G-buffer comes from sample 0 (slots [:R] — bounce 0 is
                # pre-sort, so sample blocks are still contiguous).
                hit0 = jax.tree.map(lambda x: x[:R], hit)
                surf0 = decode_surface(scene, state.ro[:R], state.rd[:R],
                                       hit0, textures=scene.has_textures)
                missed = hit0.tri < 0
                gbuffer = GBuffer(
                    normal=jnp.where(missed[:, None], 0.0, surf0.n_shade),
                    depth=hit0.t,
                    mesh_id=jnp.where(missed, -1, surf0.inst_id),
                    albedo=jnp.where(missed[:, None], 1.0, surf0.albedo),
                    world_pos=surf0.pos,
                )
        k_bounce, k_step = jax.random.split(k_bounce)
        light_uv = nee_uv if bounce == 0 else None
        bsdf_uv = lobe_u = None
        if noise_tex is not None:
            # One packed (N,5) gather routes the bounce's blue-noise
            # planes through the sorted-state permutation instead of 5
            # per-column gathers (the same packed-permute win as
            # _permute_packed; planes are pixel-ordered, pid maps slots).
            need_light = light_uv is None
            cols = ([bn(1 + 3 * bounce)] if need_light else [])
            cols += [bn(2 + 3 * bounce), bn(3 + 3 * bounce)[:, :1]]
            mat = jnp.concatenate(cols, axis=1)
            if do_sort and bounce > 0:
                mat = mat[pid]
            off = 0
            if need_light:
                light_uv = mat[:, 0:2]
                off = 2
            bsdf_uv = mat[:, off:off + 2]
            lobe_u = mat[:, off + 2]
        with jax.named_scope(f"shade{bounce}"):
            state, _ = shade_step(scene, state, hit, k_step, nee=nee,
                                  last=(bounce == bounces - 1),
                                  light_uv=light_uv, bsdf_uv=bsdf_uv,
                                  lobe_u=lobe_u, bounce=bounce)

    radiance = state.radiance
    if spp > 1:
        # Average the spp samples of each pixel with ONE scatter-add
        # (slot s*R + p -> pixel p; handles the sort permutation too).
        px = (pid if do_sort else jnp.arange(N, dtype=jnp.int32)) % R
        radiance = jnp.zeros((R, 3), radiance.dtype).at[px].add(
            radiance) / spp
    elif do_sort:
        # One scatter returns the (possibly twice-)permuted radiance to
        # pixel order.
        radiance = jnp.zeros_like(radiance).at[pid].set(radiance)
    if tiled:
        radiance = from_tile_order(radiance, width, rows)
        gbuffer = GBuffer(*(from_tile_order(f, width, rows) for f in gbuffer))

    return radiance, gbuffer


def accumulate(accum: jnp.ndarray, sample: jnp.ndarray,
               frame_count: jnp.ndarray) -> jnp.ndarray:
    """Progressive running average (AccumulationPass analog,
    renderer.rs:523-537): out = lerp(accum, sample, 1/frame_count)."""
    w = 1.0 / jnp.maximum(frame_count.astype(jnp.float32), 1.0)
    return accum + (sample - accum) * w
