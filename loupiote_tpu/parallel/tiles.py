"""Multi-device tile parallelism: shard the pixel grid over a JAX mesh.

The reference is single-GPU; its only parallelism is per-pixel SIMT
(SURVEY.md §2.3). The TPU-native scaling axis is image-tile data parallelism:
rows of the frame are sharded over a 1-D device mesh ("tiles"), the scene is
replicated in every chip's HBM (Sponza-scale scenes are ~10s of MB), each
shard traces its slab with a private RNG fold, and only display/denoise
touch cross-tile data (all_gather over ICI).

An optional second mesh axis ("spp") splits samples-per-pixel across devices
and psums the radiance — useful when devices outnumber useful tiles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.integrator import trace_paths


def make_mesh(n_tiles: Optional[int] = None, n_spp: int = 1,
              devices=None) -> Mesh:
    """1-D or 2-D device mesh: ('tiles',) or ('tiles', 'spp')."""
    devices = devices if devices is not None else jax.devices()
    if n_tiles is None:
        n_tiles = len(devices) // n_spp
    use = np.asarray(devices[: n_tiles * n_spp]).reshape(n_tiles, n_spp)
    return Mesh(use, ("tiles", "spp"))


@functools.partial(jax.jit,
                   static_argnames=("mesh", "width", "height", "bounces",
                                    "nee", "vfov", "spp"))
def trace_paths_sharded(scene, cam_to_world, key, *, mesh: Mesh, width: int,
                        height: int, bounces: int = 3, nee: bool = True,
                        vfov: float = 0.7853982, spp: int = 1,
                        jitter=None, nee_uv=None,
                        noise_tex=None, frame_count=None):
    """Sharded frame trace. Returns (radiance (H, W, 3), gbuffer dict of
    (H, W, ...) arrays), fully replicated on exit.

    Row slabs shard over 'tiles'; when the mesh has an 'spp' axis of size
    > 1, each spp shard traces the full slab with a different RNG fold and
    radiance is psum-averaged over 'spp' (sample parallelism).

    ``jitter``/``nee_uv``: optional (H, W, 2) full-frame blue-noise planes
    (render/renderer.py::blue_noise_uv); row slabs shard over 'tiles' along
    with the pixels they drive, so single-chip and multi-chip renders use
    the same deterministic sampling dimensions.
    """
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    assert height % n_tiles == 0, (
        f"height {height} must divide by mesh tiles {n_tiles}")
    rows = height // n_tiles
    use_noise = jitter is not None
    if not use_noise:
        # Constant placeholders keep shard_map's arity/specs static.
        jitter = jnp.zeros((n_tiles, 1, 2), jnp.float32)
        nee_uv = jnp.zeros((n_tiles, 1, 2), jnp.float32)
    else:
        jitter = jitter.reshape(height, width, 2)
        nee_uv = nee_uv.reshape(height, width, 2)

    if noise_tex is None:
        noise_tex_in = jnp.zeros((1, 1, 2), jnp.float32)
        fc_in = jnp.int32(0)
    else:
        noise_tex_in, fc_in = noise_tex, frame_count

    def shard_fn(scene, cam_to_world, key, jit_slab, nee_slab, ntex, fc):
        ti = jax.lax.axis_index("tiles")
        si = jax.lax.axis_index("spp")
        k = jax.random.fold_in(jax.random.fold_in(key[0], ti), si)
        rad, gb = trace_paths(scene, cam_to_world, width, height, k,
                              bounces=bounces, vfov=vfov, nee=nee,
                              jitter=(jit_slab.reshape(-1, 2)
                                      if use_noise else None),
                              nee_uv=(nee_slab.reshape(-1, 2)
                                      if use_noise else None),
                              noise_tex=(ntex if use_noise else None),
                              frame_count=(fc if use_noise else None),
                              row_offset=ti * rows, rows=rows)
        # Average radiance over the spp axis (each member traced a
        # different sample of the same slab).
        rad = jax.lax.pmean(rad, "spp")
        img = rad.reshape(rows, width, 3)

        def pick0(x):
            # G-buffers differ across spp shards only by sub-pixel jitter;
            # keep rank 0's so the output is replicated over 'spp'.
            zero = jnp.zeros_like(x)
            return jax.lax.psum(jnp.where(si == 0, x, zero), "spp")

        gbuf = {
            "normal": pick0(gb.normal.reshape(rows, width, 3)),
            "depth": pick0(gb.depth.reshape(rows, width)),
            "mesh_id": pick0(gb.mesh_id.reshape(rows, width)),
            "albedo": pick0(gb.albedo.reshape(rows, width, 3)),
            "world_pos": pick0(gb.world_pos.reshape(rows, width, 3)),
        }
        return img, gbuf

    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P("tiles"), P("tiles"), P(), P()),
        out_specs=(P("tiles"), {k: P("tiles") for k in
                                ("normal", "depth", "mesh_id", "albedo",
                                 "world_pos")}),
    )
    # key passed as (1, 2) so it replicates cleanly under shard_map.
    img, gbuf = shard(scene, cam_to_world, key[None], jitter, nee_uv,
                      noise_tex_in, fc_in)
    return img, gbuf


def replicate_scene(scene, mesh: Mesh):
    """Place every scene array replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), scene)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "width", "height", "bounces",
                                    "nee", "vfov", "mode",
                                    "atrous_iterations", "use_noise"))
def render_frame_sharded(scene, state, cam_to_world, world_to_screen,
                         accumulate_flag, *, mesh: Mesh, width: int,
                         height: int, bounces: int, nee: bool, vfov: float,
                         mode: str = "pathtrace", atrous_iterations: int = 4,
                         use_noise: bool = False):
    """Multi-chip render_frame: row slabs trace across the 'tiles' mesh axis
    (+ optional 'spp' sample parallelism); the gathered frame then runs the
    same replicated post-process (accumulation or A-SVGF) as the single-chip
    path. Mirrors render/renderer.py::render_frame semantics."""
    import jax.numpy as jnp

    from ..render.integrator import GBuffer, accumulate
    from ..render.renderer import _project_uv, blue_noise_uv

    key, k_frame = jax.random.split(state.key)
    jitter = nee_uv = None
    if use_noise:
        jitter = blue_noise_uv(state.noise_tex, state.frame_count,
                               width, height, dim=0)
        nee_uv = blue_noise_uv(state.noise_tex, state.frame_count,
                               width, height, dim=1)
    img, gbuf = trace_paths_sharded(
        scene, cam_to_world, k_frame, mesh=mesh, width=width, height=height,
        bounces=bounces, nee=nee, vfov=vfov, spp=mesh.shape["spp"],
        jitter=jitter, nee_uv=nee_uv,
        noise_tex=state.noise_tex if use_noise else None,
        frame_count=state.frame_count if use_noise else None)

    gb = GBuffer(normal=gbuf["normal"].reshape(-1, 3),
                 depth=gbuf["depth"].reshape(-1),
                 mesh_id=gbuf["mesh_id"].reshape(-1),
                 albedo=gbuf["albedo"].reshape(-1, 3),
                 world_pos=gbuf["world_pos"].reshape(-1, 3))

    uv_prev, w_prev = _project_uv(state.prev_world_to_screen, gb.world_pos)
    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    uv_curr = jnp.stack([(xx.reshape(-1) + 0.5) / width,
                         (yy.reshape(-1) + 0.5) / height], axis=1)
    valid = (gb.mesh_id >= 0) & (w_prev > 0)
    motion = (jnp.where(valid[:, None], uv_prev - uv_curr, 0.0)
              .reshape(height, width, 2))

    curr_normal = gb.normal.reshape(height, width, 3)
    curr_depth = gb.depth.reshape(height, width)
    curr_mesh = gb.mesh_id.reshape(height, width)
    curr_albedo = gb.albedo.reshape(height, width, 3)

    new = dict(key=key, prev_world_to_screen=world_to_screen,
               gb_normal=curr_normal, gb_depth=curr_depth,
               gb_mesh=curr_mesh, gb_albedo=curr_albedo, motion=motion)

    if mode == "pathtrace":
        new["accum"] = accumulate(state.accum, img, state.frame_count)
        new["frame_count"] = jnp.where(accumulate_flag,
                                       state.frame_count + 1, jnp.int32(1))
    elif mode in ("denoised", "temporal"):
        from ..denoise.asvgf import denoise, demodulate, modulate, temporal_reproject

        if mode == "denoised":
            out, t = denoise(img, curr_albedo, motion, curr_normal,
                             curr_depth, curr_mesh, state.gb_normal,
                             state.gb_depth, state.gb_mesh,
                             state.asvgf_illum, state.asvgf_moments,
                             state.asvgf_history,
                             iterations=atrous_iterations)
            new["denoised"] = out
        else:
            t = temporal_reproject(
                demodulate(img, curr_albedo), motion, curr_normal,
                curr_depth, curr_mesh, state.gb_normal, state.gb_depth,
                state.gb_mesh, state.asvgf_illum, state.asvgf_moments,
                state.asvgf_history)
        new["asvgf_illum"] = t.illum
        new["asvgf_moments"] = t.moments
        new["asvgf_history"] = t.history
        new["temporal_rgb"] = modulate(t.illum, curr_albedo)

    disp = new.get("denoised",
                   new.get("temporal_rgb", new.get("accum", state.accum)))
    new["probe"] = jnp.stack([
        img[0, 0, 0], img[height // 2, width // 2, 1],
        disp[0, 0, 2], disp[height // 2, width // 2, 0]])
    return state.replace(**new)
