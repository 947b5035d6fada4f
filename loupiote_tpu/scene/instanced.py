"""Two-level BLAS/TLAS scene buffers: per-mesh BVHs + instance transforms.

Reference: ``BLASArray::{add_bvh, add_bvh_indexed, add_instance}`` builds
one BVH per mesh and instances them with per-node transforms
(`/root/reference/crates/lib/src/scene.rs:43-49`,
`crates/lib/src/loaders/gltf.rs:129-148`). The flattened world-space build
(scene/buffers.py) stays the fast path for static scenes; this module adds
the capability the reference has that flattening loses:

  - an instance-transform update re-renders WITHOUT any BVH rebuild or
    geometry re-upload (``update_instance`` swaps one matrix row), and
  - N instances of one mesh share a single BLAS (N x memory win).

TPU-native design: no two-level traversal kernel. The TLAS level is a
static unroll over instances (instances are few; the reference's own TLAS
is an instance loop): rays transform into object space (4x4 matmul — MXU
food) and run the EXISTING per-mesh kernels; the running best-t feeds the
next instance as its tmax, so later instances traverse against a tight
bound. Shading reads the concatenated object-space attribute tables and
rotates normals by the per-instance normal matrix (ops/shade.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .buffers import SceneBuffers, build_scene_buffers
from .hdr import Probe
from .types import INVALID_INDEX, Scene


def build_instanced_buffers(scene: Scene, probe: Optional[Probe] = None,
                            atlas_size: int = 2048) -> SceneBuffers:
    """Two-level upload: one BLAS per unique mesh + instance table.

    Returns a SceneBuffers whose per-mesh ``blas`` tuple carries the
    traversal tables and whose top-level triangle tables are the
    concatenated OBJECT-space attributes (per-mesh-BVH order), so shading
    works off global ids = inst_tri_base[instance] + mesh-local id.
    """
    if not scene.instances:
        return build_scene_buffers(scene, probe=probe,
                                   atlas_size=atlas_size)

    used_meshes = sorted({inst.mesh_index for inst in scene.instances})
    mesh_slot = {m: i for i, m in enumerate(used_meshes)}

    # Per-mesh BLAS: identity single-instance scenes (object space).
    blas = []
    for m in used_meshes:
        sub = Scene.default()
        sub.materials = list(scene.materials) or sub.materials
        sub.meshes = [scene.meshes[m]]
        from .types import Instance

        sub.instances = [Instance(mesh_index=0,
                                  model_to_world=np.eye(4, dtype=np.float32),
                                  material_index=0)]
        sub.lights = []
        sub.images = []
        blas.append(build_scene_buffers(sub, treelets=False))

    # Scene-level tables (materials, atlas, lights, probe) from a
    # geometry-less build.
    shell = Scene.default()
    shell.materials = list(scene.materials)
    shell.lights = list(scene.lights)
    shell.images = list(scene.images)
    shell.meshes, shell.instances = [], []
    base_bufs = build_scene_buffers(shell, probe=probe,
                                    atlas_size=atlas_size)

    # Concatenated object-space attribute tables in per-mesh-BVH order.
    mesh_tri_base = np.zeros(len(used_meshes), np.int64)
    shade_parts, pack_parts = [], []
    total = 0
    for i, b in enumerate(blas):
        mesh_tri_base[i] = total
        shade_parts.append(np.asarray(b.tri_shade)[:b.num_tris])
        pack_parts.append(np.asarray(b.tri_pack)[:b.num_tris])
        total += b.num_tris
    from .types import pad_rows

    Tp = max(((total + 127) // 128) * 128, 128)
    tri_shade = pad_rows(np.concatenate(shade_parts), Tp, 0.0)
    tri_pack = pad_rows(np.concatenate(pack_parts), Tp, 0.0)
    tri_pack[total:, 0:3] = 1e30

    K = len(scene.instances)
    w2o = np.zeros((K, 4, 4), np.float32)
    nmat = np.zeros((K, 3, 3), np.float32)
    mat_id = np.zeros(K, np.int32)
    tri_base = np.zeros(K, np.int32)
    aabb_lo = np.zeros((K, 3), np.float32)
    aabb_hi = np.zeros((K, 3), np.float32)
    inst_mesh = []
    lo = np.full(3, np.inf, np.float32)
    hi = np.full(3, -np.inf, np.float32)
    for k, inst in enumerate(scene.instances):
        s = mesh_slot[inst.mesh_index]
        inst_mesh.append(s)
        m = np.asarray(inst.model_to_world, np.float32)
        w2o[k] = np.linalg.inv(m)
        nmat[k] = np.linalg.inv(m[:3, :3]).T
        mid = inst.material_index
        if mid == int(INVALID_INDEX) or mid >= len(scene.materials):
            mid = 0
        mat_id[k] = mid
        tri_base[k] = mesh_tri_base[s]
        l, h = _world_aabb(blas[s], m)
        aabb_lo[k], aabb_hi[k] = l, h
        lo, hi = np.minimum(lo, l), np.maximum(hi, h)

    # World bounds feed ray-sort keys and scene_exit_t; keep them live in
    # the (placeholder) node tables.
    node_min = np.asarray(base_bufs.node_min).copy()
    node_max = np.asarray(base_bufs.node_max).copy()
    node_min[0] = lo
    node_max[0] = hi

    return base_bufs.replace(
        tri_shade=jnp.asarray(tri_shade),
        tri_pack=jnp.asarray(tri_pack),
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        blas=tuple(blas),
        inst_w2o=jnp.asarray(w2o),
        inst_nmat=jnp.asarray(nmat),
        inst_mat_id=jnp.asarray(mat_id),
        inst_tri_base=jnp.asarray(tri_base),
        inst_mesh=tuple(inst_mesh),
        inst_aabb_lo=jnp.asarray(aabb_lo),
        inst_aabb_hi=jnp.asarray(aabb_hi),
        num_tris=int(total),
        num_lights=base_bufs.num_lights,
    )


def _world_aabb(mesh_bufs: SceneBuffers, m: np.ndarray):
    """World-space AABB of a mesh's object-space root box under ``m``."""
    bmin = np.asarray(mesh_bufs.node_min)[0]
    bmax = np.asarray(mesh_bufs.node_max)[0]
    pts = np.array([[x, y, z] for x in (bmin[0], bmax[0])
                    for y in (bmin[1], bmax[1])
                    for z in (bmin[2], bmax[2])], np.float32)
    w = pts @ m[:3, :3].T + m[:3, 3]
    return w.min(0), w.max(0)


def update_instance(bufs: SceneBuffers, k: int,
                    model_to_world: np.ndarray) -> SceneBuffers:
    """Move instance ``k``: swaps one transform row — NO BVH rebuild, no
    geometry re-upload (the capability flattening loses; scene.rs:43-49)."""
    m = np.asarray(model_to_world, np.float32)
    w2o = np.asarray(bufs.inst_w2o).copy()
    nmat = np.asarray(bufs.inst_nmat).copy()
    w2o[k] = np.linalg.inv(m)
    nmat[k] = np.linalg.inv(m[:3, :3]).T
    # Refresh the moved instance's cull box + world bounds.
    aabb_lo = np.asarray(bufs.inst_aabb_lo).copy()
    aabb_hi = np.asarray(bufs.inst_aabb_hi).copy()
    aabb_lo[k], aabb_hi[k] = _world_aabb(bufs.blas[bufs.inst_mesh[k]], m)
    lo, hi = aabb_lo.min(0), aabb_hi.max(0)
    node_min = np.asarray(bufs.node_min).copy()
    node_max = np.asarray(bufs.node_max).copy()
    node_min[0] = lo
    node_max[0] = hi
    return bufs.replace(inst_w2o=jnp.asarray(w2o),
                        inst_nmat=jnp.asarray(nmat),
                        inst_aabb_lo=jnp.asarray(aabb_lo),
                        inst_aabb_hi=jnp.asarray(aabb_hi),
                        node_min=jnp.asarray(node_min),
                        node_max=jnp.asarray(node_max))


# Above this instance count the TLAS switches from a static Python unroll
# (cheapest at runtime: XLA schedules each instance's kernels with traced
# constants) to one lax.scan per unique mesh — compile time then scales
# with MESH count, not instance count (VERDICT r4 #9: hundreds of
# instances must compile in seconds, like BLASArray + tinybvh handle
# arbitrary counts, /root/reference/crates/lib/src/scene.rs:43-49).
TLAS_UNROLL_MAX = 12


def _ray_box_overlap(ro, rd, lo, hi, t1):
    """(R,) bool: ray slab-overlaps [lo,hi] within (0, t1) (world space)."""
    from ..ops.intersect import T_MIN

    inv = 1.0 / jnp.where(jnp.abs(rd) > 1e-20, rd, 1e-20)
    ta = (lo[None, :] - ro) * inv
    tb = (hi[None, :] - ro) * inv
    tnear = jnp.minimum(ta, tb).max(axis=1)
    tfar = jnp.maximum(ta, tb).min(axis=1)
    return (tfar >= jnp.maximum(tnear, T_MIN)) & (tnear <= t1)


def intersect_instanced(bufs: SceneBuffers, ro, rd, tmax=None, active=None,
                        any_hit: bool = False):
    """TLAS loop: per instance, transform rays to object space and run the
    mesh kernels; the running best-t bounds each later instance.

    Two execution shapes sharing one body:
      - few instances: static Python unroll (the original path);
      - many instances: one ``lax.scan`` per unique mesh over that mesh's
        instance table, with a per-instance world-AABB slab cull masking
        rays before they enter the BLAS (rays whose sub-packet misses the
        box retire in ~1 kernel step). Compiled size is O(unique meshes).
    """
    from ..ops.intersect import INVALID_TRI, T_FAR, Hit, intersect_any

    R = ro.shape[0]
    best_t = (jnp.full(R, T_FAR, jnp.float32) if tmax is None
              else tmax.astype(jnp.float32))
    best_tri = jnp.full(R, INVALID_TRI, jnp.int32)
    best_inst = jnp.full(R, -1, jnp.int32)
    act = (jnp.ones(R, jnp.bool_) if active is None else active)
    K = len(bufs.inst_mesh)

    def visit(carry, slot, w2o, tri_base, inst_id, box, in_scan=False):
        best_t, best_tri, best_inst = carry
        lane_act = act
        if box is not None:
            lane_act = lane_act & _ray_box_overlap(ro, rd, box[0], box[1],
                                                   best_t)
        if any_hit:
            lane_act = lane_act & (best_tri < 0)  # already blocked: skip
        ro_o = ro @ w2o[:3, :3].T + w2o[:3, 3]
        rd_o = rd @ w2o[:3, :3].T  # unnormalized: t stays world-param
        if in_scan:
            # A Pallas custom call inside lax.scan crashes XLA:TPU's
            # priority-fusion cost model (SIGILL in
            # TpuPriorityFusionQueue::CalculateProducerPriority...,
            # artifacts/r5_device2/bench_instanced.log; reproduced at
            # small scale). Scanned meshes are small prop BLASes, so the
            # vectorized XLA packet path is the safe body.
            import math

            from ..ops.intersect import PACKET_SIZE, intersect_packets

            hit = intersect_packets(bufs.blas[slot], ro_o, rd_o,
                                    tmax=best_t, active=lane_act,
                                    any_hit=any_hit,
                                    packet_size=math.gcd(R, PACKET_SIZE))
        else:
            hit = intersect_any(bufs.blas[slot], ro_o, rd_o, tmax=best_t,
                                active=lane_act, any_hit=any_hit)
        if any_hit:
            win = hit.tri >= 0  # blocked flag; t is not meaningful
        else:
            win = (hit.tri >= 0) & (hit.t < best_t)
            best_t = jnp.where(win, hit.t, best_t)
        best_tri = jnp.where(win, hit.tri + tri_base, best_tri)
        best_inst = jnp.where(win, inst_id, best_inst)
        return best_t, best_tri, best_inst

    carry = (best_t, best_tri, best_inst)
    if K <= TLAS_UNROLL_MAX or bufs.inst_aabb_lo is None:
        for k, slot in enumerate(bufs.inst_mesh):
            carry = visit(carry, slot, bufs.inst_w2o[k],
                          bufs.inst_tri_base[k], k, None)
    else:
        # XLA:TPU's priority-fusion cost model SIGILLs when it considers
        # fusing computed ray producers into the scan region (bisect:
        # experiments/scan_crash_probe{,2,3}.py — argument rays compile,
        # raygen-computed rays crash, Pallas-free variants crash too).
        # An optimization barrier pins the scan inputs as materialized
        # values, taking the crashing fusion candidates off the table.
        ro, rd, act, best_t = jax.lax.optimization_barrier(
            (ro, rd, act, best_t))
        slots = np.asarray(bufs.inst_mesh)
        for slot in sorted(set(bufs.inst_mesh)):
            idx = np.nonzero(slots == slot)[0].astype(np.int32)
            if len(idx) <= 2:
                # Single/rare instances unroll: a length-1 scan only adds
                # compile surface (and a scan wrapping the big wide-mesh
                # kernel crashed XLA:TPU's priority-fusion cost model —
                # artifacts/r5_device2/bench_instanced.log).
                for k in idx:
                    k = int(k)
                    carry = visit(carry, slot, bufs.inst_w2o[k],
                                  bufs.inst_tri_base[k], k,
                                  (bufs.inst_aabb_lo[k],
                                   bufs.inst_aabb_hi[k]))
                continue
            ids = jnp.asarray(idx)

            def body(c, k, slot=slot):
                c = visit(c, slot, bufs.inst_w2o[k], bufs.inst_tri_base[k],
                          k, (bufs.inst_aabb_lo[k], bufs.inst_aabb_hi[k]),
                          in_scan=True)
                return c, None

            carry, _ = jax.lax.scan(body, carry, ids)
    best_t, best_tri, best_inst = carry

    from ..ops.intersect import recompute_uv

    # tri_pack holds OBJECT-space triangles (per-mesh-BVH order), so the
    # barycentric replay must run in object space too: transform each ray by
    # its WINNING instance's world-to-object matrix before recompute_uv.
    # (Replaying in world space returned wrong u/v for any instance with a
    # non-identity transform — round-3 advisor finding.)
    w2o_win = bufs.inst_w2o[jnp.maximum(best_inst, 0)]  # (R, 4, 4)
    ro_win = jnp.einsum("rij,rj->ri", w2o_win[:, :3, :3], ro) \
        + w2o_win[:, :3, 3]
    rd_win = jnp.einsum("rij,rj->ri", w2o_win[:, :3, :3], rd)
    u, v = recompute_uv(bufs, ro_win, rd_win, best_tri)
    return Hit(best_t, best_tri, u, v, inst=best_inst)


def occluded_instanced(bufs: SceneBuffers, ro, rd, dist,
                       active=None) -> jnp.ndarray:
    tmax = dist * (1.0 - 1e-3)
    hit = intersect_instanced(bufs, ro, rd, tmax=tmax, active=active,
                              any_hit=True)
    out = hit.tri >= 0
    if active is not None:
        out = out & active
    return out
