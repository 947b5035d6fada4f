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

import math
import os
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


# --- Candidate-gather TLAS ------------------------------------------------
#
# The scan TLAS above TLAS_UNROLL_MAX pays one full-wave dispatch PER
# INSTANCE (200 instances = 200 sequential waves: 57 s/frame at 1080p,
# BENCH r5 window 4). The candidate TLAS instead computes, per ray, the C
# nearest slab-overlapping instance AABBs of each unique mesh (measured on
# the bench scene: mean 0.05 overlaps/ray, max 9 vs 200 boxes —
# experiments/tlas_overlap_stats.py), then runs C waves in which EVERY RAY
# traverses ITS OWN candidate instance: the world-to-object matrix rides a
# per-ray packed (R,16) row gather (same trick as the packed sort permute)
# and the shared per-mesh BLAS kernel runs once per candidate slot, not
# once per instance. Rays are Morton-sorted, so the few active rays of a
# slot cluster into few sub-packet cells and inactive cells retire in ~1
# union step. Exactness for rays overlapping >C boxes comes from a
# lax.while_loop drain (Pallas-free body) over a per-ray processed-bitmask
# — at bench scale it runs 0 iterations.
#
# Reference bar: BLASArray + tinybvh traverse a real binned TLAS per
# thread for arbitrary instance counts
# (/root/reference/crates/lib/src/scene.rs:43-49); this is the TPU-shaped
# equivalent (top level as data-parallel candidate selection, bottom level
# as the existing shared-BLAS wave kernels).

_TLAS_CHUNK = 16384  # rays per selection chunk: bounds (chunk, K) live


def _tlas_c() -> int:
    return max(int(os.environ.get("LOUPIOTE_TLAS_C", "12")), 1)


def _chunk_tnear(ro_c, inv_c, lim_c, lo, hi):
    """(chunk, K) entry-t of overlapping boxes, +inf where no overlap.

    Axis-at-a-time so only (chunk, K) arrays are ever live (the
    (chunk, K, 3) broadcast would be ~80 MB per chunk at K=200).
    """
    from ..ops.intersect import T_MIN

    tn = jnp.full((ro_c.shape[0], lo.shape[0]), -jnp.inf, jnp.float32)
    tf = jnp.full_like(tn, jnp.inf)
    for a in range(3):
        ta = (lo[None, :, a] - ro_c[:, a:a + 1]) * inv_c[:, a:a + 1]
        tb = (hi[None, :, a] - ro_c[:, a:a + 1]) * inv_c[:, a:a + 1]
        tn = jnp.maximum(tn, jnp.minimum(ta, tb))
        tf = jnp.minimum(tf, jnp.maximum(ta, tb))
    ov = (tf >= jnp.maximum(tn, T_MIN)) & (tn <= lim_c[:, None])
    return jnp.where(ov, tn, jnp.inf)


def _chunked(ro, rd, lim, fn):
    """Run ``fn(ro_c, inv_c, lim_c) -> pytree`` over ray chunks."""
    R = ro.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(rd) > 1e-20, rd, 1e-20)
    ch = min(_TLAS_CHUNK, R)
    pad = (-R) % ch
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        inv = jnp.concatenate([inv, jnp.ones((pad, 3), inv.dtype)])
        lim = jnp.concatenate([lim, jnp.full(pad, -jnp.inf, lim.dtype)])
    n = (R + pad) // ch
    if n == 1:
        out = fn(ro, inv, lim)
    else:
        out = jax.lax.map(
            lambda x: fn(*x),
            (ro.reshape(n, ch, 3), inv.reshape(n, ch, 3),
             lim.reshape(n, ch)))
        out = jax.tree.map(
            lambda x: x.reshape((n * ch,) + x.shape[2:]), out)
    return jax.tree.map(lambda x: x[:R], out)


def _select_topc(ro, rd, lim, lo, hi, C):
    """Per-ray C nearest overlapping boxes: (ids (R,C) i32, tnear (R,C)
    f32 [+inf invalid], n_overlap (R,) i32)."""
    def fn(ro_c, inv_c, lim_c):
        tn = _chunk_tnear(ro_c, inv_c, lim_c, lo, hi)
        vals, ids = jax.lax.top_k(-tn, C)
        return ids.astype(jnp.int32), -vals, \
            jnp.isfinite(tn).sum(axis=1).astype(jnp.int32)

    return _chunked(ro, rd, lim, fn)


def _select_next(ro, rd, lim, lo, hi, processed):
    """Nearest unprocessed overlapping box per ray: (id, tnear, valid)."""
    K = lo.shape[0]
    word = np.arange(K) // 32
    bit = np.asarray(np.arange(K) % 32, np.uint32)

    def fn(ro_c, inv_c, lim_c, proc_c):
        tn = _chunk_tnear(ro_c, inv_c, lim_c, lo, hi)
        done = (proc_c[:, word] >> bit[None, :]) & jnp.uint32(1)
        tn = jnp.where(done == 0, tn, jnp.inf)
        nid = jnp.argmin(tn, axis=1).astype(jnp.int32)
        ntn = jnp.take_along_axis(tn, nid[:, None], axis=1)[:, 0]
        return nid, ntn, jnp.isfinite(ntn)

    # Thread the per-ray processed words through the same chunking.
    R = ro.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(rd) > 1e-20, rd, 1e-20)
    ch = min(_TLAS_CHUNK, R)
    pad = (-R) % ch
    W = processed.shape[1]
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        inv = jnp.concatenate([inv, jnp.ones((pad, 3), inv.dtype)])
        lim = jnp.concatenate([lim, jnp.full(pad, -jnp.inf, lim.dtype)])
        processed = jnp.concatenate(
            [processed, jnp.zeros((pad, W), processed.dtype)])
    n = (R + pad) // ch
    if n == 1:
        out = fn(ro, inv, lim, processed)
    else:
        out = jax.lax.map(
            lambda x: fn(*x),
            (ro.reshape(n, ch, 3), inv.reshape(n, ch, 3),
             lim.reshape(n, ch), processed.reshape(n, ch, W)))
        out = jax.tree.map(
            lambda x: x.reshape((n * ch,) + x.shape[2:]), out)
    return jax.tree.map(lambda x: x[:R], out)


def _set_bits(processed, ids, on):
    """OR bit ``ids`` (R,) into the (R, W) uint32 mask where ``on``."""
    W = processed.shape[1]
    wsel = ids // 32
    bits = jnp.where(on, jnp.left_shift(jnp.uint32(1),
                                        (ids % 32).astype(jnp.uint32)),
                     jnp.uint32(0))
    onehot = wsel[:, None] == jnp.arange(W, dtype=jnp.int32)[None, :]
    return processed | jnp.where(onehot, bits[:, None], jnp.uint32(0))


def _candidate_group(bufs, slot, idx, carry, ro, rd, act, any_hit):
    """Traverse one unique-mesh instance group via candidate waves.

    ``carry`` = (best_t, best_tri, best_inst); for any-hit best_t stays the
    caller's tmax (the blocked flag lives in best_tri >= 0).
    """
    from ..ops.intersect import PACKET_SIZE, intersect_any, intersect_packets

    best_t, best_tri, best_inst = carry
    R = ro.shape[0]
    Ks = len(idx)
    C = min(_tlas_c(), Ks)
    gids = jnp.asarray(np.asarray(idx, np.int32))  # (Ks,) global inst ids
    lo = bufs.inst_aabb_lo[gids]
    hi = bufs.inst_aabb_hi[gids]
    w2o_tbl = bufs.inst_w2o[gids].reshape(Ks, 16)
    tri_base = bufs.inst_tri_base[int(idx[0])]  # same mesh => same base

    lim0 = jnp.where(act, best_t, -jnp.inf)
    ids, tns, n_ov = _select_topc(ro, rd, lim0, lo, hi, C)

    def wave(carry, sel_id, sel_tn, pallas_ok):
        best_t, best_tri, best_inst = carry
        lane = act & jnp.isfinite(sel_tn) & (sel_tn < best_t)
        if any_hit:
            lane = lane & (best_tri < 0)  # already blocked: skip
        rows = w2o_tbl[jnp.maximum(sel_id, 0)]  # (R, 16) packed gather
        M = rows.reshape(-1, 4, 4)
        ro_o = jnp.einsum("rij,rj->ri", M[:, :3, :3], ro) + M[:, :3, 3]
        rd_o = jnp.einsum("rij,rj->ri", M[:, :3, :3], rd)
        if pallas_ok:
            hit = intersect_any(bufs.blas[slot], ro_o, rd_o, tmax=best_t,
                                active=lane, any_hit=any_hit)
        else:
            # Pallas-free body for the while_loop drain (a Pallas call in
            # a scan region crashed XLA:TPU priority fusion; see above).
            hit = intersect_packets(bufs.blas[slot], ro_o, rd_o,
                                    tmax=best_t, active=lane,
                                    any_hit=any_hit,
                                    packet_size=math.gcd(R, PACKET_SIZE))
        if any_hit:
            win = hit.tri >= 0
        else:
            win = (hit.tri >= 0) & (hit.t < best_t)
            best_t = jnp.where(win, hit.t, best_t)
        best_tri = jnp.where(win, hit.tri + tri_base, best_tri)
        best_inst = jnp.where(win, gids[jnp.maximum(sel_id, 0)], best_inst)
        return best_t, best_tri, best_inst

    for c in range(C):
        carry = wave(carry, ids[:, c], tns[:, c], True)

    if C >= Ks:
        return carry

    # Exact drain for rays overlapping more than C boxes (bench scene:
    # never — max 9 overlaps vs C=12; synthetic dense scenes: a few rays).
    # An unprocessed candidate can only matter while its box entry-t beats
    # the carried limit (closest: current best_t; any-hit: tmax, and only
    # while unblocked).
    best_t, best_tri, best_inst = carry
    W = (Ks + 31) // 32
    processed = jnp.zeros((R, W), jnp.uint32)
    for c in range(C):
        processed = _set_bits(processed, ids[:, c], jnp.isfinite(tns[:, c]))
    pend = act & (n_ov > C) & (tns[:, C - 1] < best_t)
    if any_hit:
        pend = pend & (best_tri < 0)

    def body(state):
        _, best_t, best_tri, best_inst, processed = state
        lim = jnp.where(act, best_t, -jnp.inf)
        if any_hit:
            lim = jnp.where(best_tri < 0, lim, -jnp.inf)
        nid, ntn, valid = _select_next(ro, rd, lim, lo, hi, processed)
        processed = _set_bits(processed, nid, valid)
        c2 = wave((best_t, best_tri, best_inst),
                  jnp.where(valid, nid, 0),
                  jnp.where(valid, ntn, jnp.inf), False)
        return (jnp.any(valid),) + c2 + (processed,)

    state = jax.lax.while_loop(
        lambda s: s[0], body,
        (jnp.any(pend), best_t, best_tri, best_inst, processed))
    return state[1], state[2], state[3]


def intersect_instanced(bufs: SceneBuffers, ro, rd, tmax=None, active=None,
                        any_hit: bool = False):
    """TLAS loop: per instance, transform rays to object space and run the
    mesh kernels; the running best-t bounds each later instance.

    Execution shapes sharing one body:
      - few instances: static Python unroll (the original path);
      - many instances (default, ``LOUPIOTE_TLAS=cand``): the
        candidate-gather TLAS — per-ray top-C nearest overlapping
        instance AABBs, C waves with per-ray gathered world-to-object
        transforms, exact while_loop drain for >C overlaps. Compiled
        size is O(unique meshes * C); wave count is C, not K.
      - ``LOUPIOTE_TLAS=scan`` (CPU-only debug): one ``lax.scan`` per
        unique mesh over that mesh's instance table with per-instance
        AABB culls. MISCOMPILES on XLA:TPU — see the dispatch comment
        below — and costs one full wave per instance.
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
        carry = (best_t, best_tri, best_inst)
        mode = os.environ.get("LOUPIOTE_TLAS", "cand")
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
            if mode != "scan":
                # Candidate-gather TLAS: C waves total (per-ray top-C
                # nearest boxes + per-ray w2o gather) instead of one wave
                # per instance — 200 instances cost C=12 waves, not 200.
                # Also the only TPU-SAFE many-instance path: the scan mode
                # below MISCOMPILES on XLA:TPU (7/1024 rays with false
                # hits AND misses refuted by float64 ground truth —
                # artifacts/r5_device8/tlas_{mismatch_tpu,groundtruth}.log;
                # same priority-fusion region that SIGILLed pre-barrier).
                # scan remains correct on CPU (tests/test_instanced.py)
                # and is kept only as an off-TPU debug fallback.
                carry = _candidate_group(bufs, slot, idx, carry, ro, rd,
                                         act, any_hit)
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
