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
                        vfov: float = 0.7853982, spp: int = 1):
    """Sharded frame trace. Returns (radiance (H, W, 3), gbuffer dict of
    (H, W, ...) arrays), fully replicated on exit.

    Row slabs shard over 'tiles'; when the mesh has an 'spp' axis of size
    > 1, each spp shard traces the full slab with a different RNG fold and
    radiance is psum-averaged over 'spp' (sample parallelism).
    """
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    assert height % n_tiles == 0, (
        f"height {height} must divide by mesh tiles {n_tiles}")
    rows = height // n_tiles

    def shard_fn(scene, cam_to_world, key):
        ti = jax.lax.axis_index("tiles")
        si = jax.lax.axis_index("spp")
        k = jax.random.fold_in(jax.random.fold_in(key[0], ti), si)
        rad, gb = trace_paths(scene, cam_to_world, width, height, k,
                              bounces=bounces, vfov=vfov, nee=nee,
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
        in_specs=(P(), P(), P()),
        out_specs=(P("tiles"), {k: P("tiles") for k in
                                ("normal", "depth", "mesh_id", "albedo",
                                 "world_pos")}),
    )
    # key passed as (1, 2) so it replicates cleanly under shard_map.
    img, gbuf = shard(scene, cam_to_world, key[None])
    return img, gbuf


def replicate_scene(scene, mesh: Mesh):
    """Place every scene array replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), scene)
