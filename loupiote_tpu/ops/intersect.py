"""BVH traversal + ray-triangle intersection (the IntersectorPass analog).

Reference behavior: ``IntersectorPass`` dispatches one thread per pixel and
writes an ``Intersection`` record per ray (`crates/lib/src/renderer.rs:453-464`;
kernel source not mounted — semantics are classic BVH + Moller-Trumbore).

TPU-native design: rays are a flat (R,) SoA batch. Traversal is a single
``lax.while_loop`` over a *threaded* BVH (see accel/bvh.py): every ray holds
one int of state (current node) and steps via hit/miss links — no stacks, no
data-dependent shapes, only row gathers from HBM. All lanes advance in
lockstep with masking; rays that finish park at the END sentinel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..accel.bvh import LEAF_MAX

INVALID_TRI = jnp.int32(-1)
T_MIN = 1e-4
T_FAR = 1e30


class Hit(NamedTuple):
    """Per-ray intersection record (the ``Intersection`` SSBO analog)."""

    t: jnp.ndarray  # (R,) float32, T_FAR when miss
    tri: jnp.ndarray  # (R,) int32, -1 when miss
    u: jnp.ndarray  # (R,) float32 barycentric
    v: jnp.ndarray  # (R,) float32 barycentric
    # Instance id for two-level (BLAS/TLAS) scenes; None on the flattened
    # path (tri_shade then carries the per-triangle instance).
    inst: jnp.ndarray | None = None


def _bitcast_i32(x):
    return lax.bitcast_convert_type(x, jnp.int32)


def intersect_rays(scene, ro, rd, tmax=None, active=None,
                   any_hit: bool = False, max_steps: int | None = None) -> Hit:
    """Trace rays against the scene BVH.

    Args:
      scene: SceneBuffers.
      ro, rd: (R, 3) float32 ray origins / directions (rd need not be unit).
      tmax: optional (R,) float32 upper bound (e.g. shadow ray length).
      active: optional (R,) bool; inactive rays return a miss.
      any_hit: stop a ray at its first confirmed hit (shadow rays).
      max_steps: safety bound on traversal iterations (default 4 * nodes).
    """
    R = ro.shape[0]
    end = jnp.int32(scene.end_index)
    # Derive loop-carry inits from the ray arrays (zero-cost, folded by XLA)
    # so their sharding/varying types match the loop body under shard_map
    # (both ro and rd: either may be the only varying input).
    zero_r = (ro[:, 0] + rd[:, 0]) * 0.0
    node0 = zero_r.astype(jnp.int32)
    if active is not None:
        node0 = jnp.where(active, node0, end)

    t0 = (zero_r + T_FAR) if tmax is None else (tmax.astype(jnp.float32) + zero_r)
    inv_d = 1.0 / jnp.where(jnp.abs(rd) > 1e-20, rd, jnp.where(rd >= 0, 1e-20, -1e-20))

    if max_steps is None:
        max_steps = 4 * scene.num_nodes + 64
    leaf_cap = int(getattr(scene, "leaf_cap", LEAF_MAX))

    class S(NamedTuple):
        node: jnp.ndarray
        t: jnp.ndarray
        tri: jnp.ndarray
        u: jnp.ndarray
        v: jnp.ndarray
        steps: jnp.ndarray

    def cond(s: S):
        return jnp.logical_and(jnp.any(s.node != end), s.steps < max_steps)

    def body(s: S):
        nidx = jnp.minimum(s.node, end - 1)  # clamp parked rays; masked below
        row = scene.node_pack[nidx]  # (R, 9) single gather
        nmin = row[:, 0:3]
        nmax = row[:, 3:6]
        first = _bitcast_i32(row[:, 6])
        count = _bitcast_i32(row[:, 7])
        miss = _bitcast_i32(row[:, 8])

        live = s.node != end

        # Slab test against current best t.
        t1 = (nmin - ro) * inv_d
        t2 = (nmax - ro) * inv_d
        tnear = jnp.max(jnp.minimum(t1, t2), axis=1)
        tfar = jnp.min(jnp.maximum(t1, t2), axis=1)
        box_hit = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < s.t) & live

        is_leaf = count > 0
        do_leaf = box_hit & is_leaf

        # Leaf: test up to the scene's actual max leaf occupancy
        # (Moller-Trumbore), masked.
        t_best, tri_best, u_best, v_best = s.t, s.tri, s.u, s.v
        for k in range(leaf_cap):
            tri_idx = first + k
            valid = do_leaf & (k < count)
            safe_idx = jnp.where(valid, tri_idx, 0)
            trow = scene.tri_pack[safe_idx]  # (R, 9)
            p0 = trow[:, 0:3]
            e1 = trow[:, 3:6]
            e2 = trow[:, 6:9]
            pvec = jnp.cross(rd, e2)
            det = jnp.sum(e1 * pvec, axis=1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = ro - p0
            u = jnp.sum(tvec * pvec, axis=1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(rd * qvec, axis=1) * inv_det
            t = jnp.sum(e2 * qvec, axis=1) * inv_det
            ok = (valid & (jnp.abs(det) > 1e-12)
                  & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t > T_MIN) & (t < t_best))
            t_best = jnp.where(ok, t, t_best)
            tri_best = jnp.where(ok, tri_idx, tri_best)
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)

        # Next node: descend on internal hit, else follow miss link.
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, s.node + 1, miss)
        nxt = jnp.where(live, nxt, end)
        if any_hit:
            nxt = jnp.where(tri_best != INVALID_TRI, end, nxt)

        return S(nxt, t_best, tri_best, u_best, v_best, s.steps + 1)

    init = S(node0, t0, zero_r.astype(jnp.int32) + INVALID_TRI,
             zero_r, zero_r, jnp.int32(0))
    out = lax.while_loop(cond, body, init)
    return Hit(out.t, out.tri, out.u, out.v)


def recompute_uv(scene, ro, rd, tri):
    """Barycentrics of the winning triangle, recomputed once per ray.

    The Pallas traversal kernels track only (t, tri) — two fewer (8,128)
    select chains per unrolled triangle and two fewer output buffers; the
    u/v the shader needs come from this single Moller-Trumbore replay
    (formulas identical to intersect_rays, so values match the oracle)."""
    safe = jnp.maximum(tri, 0)
    trow = scene.tri_pack[safe]  # (R, 9)
    p0 = trow[:, 0:3]
    e1 = trow[:, 3:6]
    e2 = trow[:, 6:9]
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = ro - p0
    u = jnp.sum(tvec * pvec, axis=1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=1) * inv_det
    miss = tri < 0
    return jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v)


PACKET_SIZE = 1024  # rays per packet (one 8x128 VREG tile)
STACK_DEPTH = 64


def intersect_packets(scene, ro, rd, tmax=None, active=None,
                      any_hit: bool = False,
                      max_steps: int | None = None,
                      packet_size: int | None = None) -> Hit:
    """Packet traversal: the TPU-native fast path.

    Rays are grouped into packets of PACKET_SIZE; each packet shares ONE
    traversal (a per-packet stack of ints). Per step, a packet fetches a
    single BVH node row (K row gathers total, K = #packets) and broadcasts
    it to all its rays: the AABB slab test and Moller-Trumbore run as dense
    (K, P) VPU math with zero per-ray gathers. This trades redundant node
    visits (a packet visits the union of its rays' nodes) for removing the
    per-ray gather traffic that dominates SIMT-style traversal on TPU.

    Requires ro.shape[0] % PACKET_SIZE == 0 (trace_paths arranges rays in
    spatially coherent 8x128 pixel tiles so packet unions stay tight).
    """
    R = ro.shape[0]
    P = packet_size or PACKET_SIZE
    assert R % P == 0, f"ray count {R} not a multiple of {P}"
    K = R // P
    end = jnp.int32(scene.end_index)
    # Sized from the built tree's max depth (scene/buffers.py), so the
    # clamped pushes below can never actually drop a subtree.
    stack_depth = int(getattr(scene, "stack_depth", STACK_DEPTH))

    ro_p = ro.reshape(K, P, 3)
    rd_p = rd.reshape(K, P, 3)
    inv_d = 1.0 / jnp.where(jnp.abs(rd_p) > 1e-20,
                            rd_p, jnp.where(rd_p >= 0, 1e-20, -1e-20))
    # Majority direction sign per packet/axis: drives near-child-first
    # ordering (children are split low/high along the node's split axis).
    dir_pos = jnp.sum(jnp.sign(rd_p), axis=1) >= 0.0  # (K, 3) bool

    zero_rp = (ro_p[:, :, 0] + rd_p[:, :, 0]) * 0.0  # (K,P) vma-carrier
    zero_k = zero_rp[:, 0]

    t0 = (zero_rp + T_FAR) if tmax is None else (
        tmax.reshape(K, P) + zero_rp)
    ray_on = jnp.ones((K, P), jnp.bool_) if active is None else active.reshape(K, P)

    if max_steps is None:
        max_steps = 4 * scene.num_nodes + 64
    leaf_cap = int(getattr(scene, "leaf_cap", LEAF_MAX))

    class S(NamedTuple):
        node: jnp.ndarray  # (K,)
        ptr: jnp.ndarray  # (K,)
        stack: jnp.ndarray  # (K, STACK_DEPTH)
        done: jnp.ndarray  # (K,)
        t: jnp.ndarray  # (K, P)
        tri: jnp.ndarray  # (K, P)
        u: jnp.ndarray  # (K, P)
        v: jnp.ndarray  # (K, P)
        blocked: jnp.ndarray  # (K, P) any-hit bookkeeping
        steps: jnp.ndarray

    def cond(s: S):
        return jnp.logical_and(jnp.any(~s.done), s.steps < max_steps)

    def body(s: S):
        nidx = jnp.where(s.done, 0, s.node)
        row = scene.node_pack[nidx]  # (K, 12) -- the ONLY node gather
        nmin = row[:, None, 0:3]
        nmax = row[:, None, 3:6]
        first = _bitcast_i32(row[:, 6])
        count = _bitcast_i32(row[:, 7])
        right = _bitcast_i32(row[:, 9])
        axis = _bitcast_i32(row[:, 10])

        t1 = (nmin - ro_p) * inv_d
        t2 = (nmax - ro_p) * inv_d
        tnear = jnp.max(jnp.minimum(t1, t2), axis=2)
        tfar = jnp.min(jnp.maximum(t1, t2), axis=2)
        ray_live = ray_on & ~s.blocked
        ray_hit = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < s.t) & ray_live
        hit_any = jnp.any(ray_hit, axis=1) & ~s.done
        is_leaf = count > 0
        do_leaf = hit_any & is_leaf

        t_b, tri_b, u_b, v_b = s.t, s.tri, s.u, s.v
        blocked = s.blocked
        for k in range(leaf_cap):
            tri_idx = first + k
            valid = do_leaf & (k < count)  # (K,)
            trow = scene.tri_pack[jnp.where(valid, tri_idx, 0)]  # (K, 9)
            p0 = trow[:, None, 0:3]
            e1 = trow[:, None, 3:6]
            e2 = trow[:, None, 6:9]
            pvec = jnp.cross(rd_p, jnp.broadcast_to(e2, rd_p.shape))
            det = jnp.sum(jnp.broadcast_to(e1, rd_p.shape) * pvec, axis=2)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = ro_p - p0
            uu = jnp.sum(tvec * pvec, axis=2) * inv_det
            qvec = jnp.cross(tvec, jnp.broadcast_to(e1, tvec.shape))
            vv = jnp.sum(rd_p * qvec, axis=2) * inv_det
            tt = jnp.sum(jnp.broadcast_to(e2, qvec.shape) * qvec, axis=2) * inv_det
            ok = (valid[:, None] & ray_live & (jnp.abs(det) > 1e-12)
                  & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                  & (tt > T_MIN) & (tt < t_b))
            t_b = jnp.where(ok, tt, t_b)
            tri_b = jnp.where(ok, tri_idx[:, None], tri_b)
            u_b = jnp.where(ok, uu, u_b)
            v_b = jnp.where(ok, vv, v_b)
            if any_hit:
                blocked = blocked | ok

        # Control: descend near child first (push far), else pop. Near is
        # the low-coordinate (left) child when the packet's majority ray
        # direction along the split axis is positive.
        descend = hit_any & ~is_leaf
        axis_pos = jnp.take_along_axis(
            dir_pos, jnp.maximum(axis, 0)[:, None], axis=1)[:, 0]
        near = jnp.where(axis_pos, s.node + 1, right)
        far = jnp.where(axis_pos, right, s.node + 1)
        kk = jnp.arange(K)
        new_stack = s.stack.at[kk, jnp.minimum(s.ptr, stack_depth - 1)].set(
            jnp.where(descend, far, s.stack[kk, jnp.minimum(s.ptr, stack_depth - 1)]))
        can_pop = s.ptr > 0
        pop_idx = jnp.maximum(s.ptr - 1, 0)
        popped = new_stack[kk, pop_idx]
        new_node = jnp.where(descend, near,
                             jnp.where(can_pop, popped, end))
        new_ptr = jnp.where(descend, jnp.minimum(s.ptr + 1, stack_depth - 1),
                            jnp.maximum(s.ptr - 1, 0))
        done = s.done | (new_node == end)
        if any_hit:
            done = done | jnp.all(blocked | ~ray_on, axis=1)

        return S(jnp.where(done, end, new_node), new_ptr, new_stack, done,
                 t_b, tri_b, u_b, v_b, blocked, s.steps + 1)

    init = S(
        node=zero_k.astype(jnp.int32),
        ptr=zero_k.astype(jnp.int32),
        stack=jnp.zeros((K, stack_depth), jnp.int32) + zero_k.astype(jnp.int32)[:, None],
        done=zero_k.astype(jnp.bool_) | ~jnp.any(ray_on, axis=1),
        t=t0,
        tri=zero_rp.astype(jnp.int32) + INVALID_TRI,
        u=zero_rp,
        v=zero_rp,
        blocked=zero_rp.astype(jnp.bool_),
        steps=jnp.int32(0),
    )
    out = lax.while_loop(cond, body, init)
    tri = jnp.where(ray_on, out.tri, INVALID_TRI).reshape(R)
    return Hit(out.t.reshape(R), tri, out.u.reshape(R), out.v.reshape(R))


def _pallas_enabled() -> bool:
    import os

    if os.environ.get("LOUPIOTE_NO_PALLAS") == "1":
        return False
    if os.environ.get("LOUPIOTE_FORCE_PALLAS") == "1":
        return True
    return jax.default_backend() in ("tpu", "axon")


# Per-scene kernel choice thresholds (tunable via env for experiments).
_WIDE_MIN_NODES = 8192  # below this the BVH2 sub-packet kernel wins
_WIDE_MAX_BYTES = 96 * 1024 * 1024  # trav_rows maps whole into VMEM


def _treelet_enabled(scene) -> bool:
    """Archived two-phase per-lane pipeline (experiments/treelet/) — CLOSED
    by round-4 device measurement (0.87x diffuse / 0.29x shadow vs the wide
    kernel even with uncontended XLA sort). The hook remains only so the
    archived A/B benches can re-run; requires the repo root on sys.path."""
    import os

    return (os.environ.get("LOUPIOTE_TREELET") == "1"
            and getattr(scene, "treelet", None) is not None)


def _wide_enabled(scene) -> bool:
    import os

    if os.environ.get("LOUPIOTE_NO_WIDE") == "1":
        return False
    rows = getattr(scene, "trav_rows", None)
    if rows is None:
        return False
    if os.environ.get("LOUPIOTE_FORCE_WIDE") == "1":
        return True
    # Small scenes: the 8-wide kernel's per-step cost is wasted on tiny
    # trees (VERDICT r2: Cornell interactive regression) — the BVH2
    # sub-packet kernel is faster there.
    min_nodes = int(os.environ.get("LOUPIOTE_WIDE_MIN_NODES",
                                   _WIDE_MIN_NODES))
    if int(scene.num_nodes) < min_nodes:
        return False
    # VMEM ceiling: the unified row table is mapped whole into VMEM with a
    # 110MB limit; oversized scenes fall back to the BVH2 kernel, which
    # streams nodes from HBM.
    if int(rows.size) * 4 > _WIDE_MAX_BYTES:
        return False
    return True


def intersect_any(scene, ro, rd, tmax=None, active=None,
                  any_hit: bool = False) -> Hit:
    """Dispatch: Pallas sub-packet kernel on TPU, XLA packets elsewhere.

    Odd batch sizes are padded with inactive rays up to the packet size —
    the per-ray SIMT path is ~100x slower and only remains as the tiny-batch
    (< 1 packet) and correctness-oracle path.
    """
    # Two-level BLAS/TLAS scenes route through the instance loop
    # (scene/instanced.py); each per-mesh trace re-enters this dispatch.
    if getattr(scene, "inst_w2o", None) is not None:
        from ..scene.instanced import intersect_instanced

        return intersect_instanced(scene, ro, rd, tmax=tmax, active=active,
                                   any_hit=any_hit)
    R = ro.shape[0]
    pad = (-R) % PACKET_SIZE
    if pad and R >= PACKET_SIZE // 2:
        zeros3 = jnp.zeros((pad, 3), ro.dtype)
        ro_p = jnp.concatenate([ro, zeros3])
        rd_p = jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)])
        tmax_p = (None if tmax is None
                  else jnp.concatenate([tmax, jnp.zeros(pad, tmax.dtype)]))
        act = jnp.ones(R, jnp.bool_) if active is None else active
        act_p = jnp.concatenate([act, jnp.zeros(pad, jnp.bool_)])
        hit = intersect_any(scene, ro_p, rd_p, tmax=tmax_p, active=act_p,
                            any_hit=any_hit)
        return Hit(hit.t[:R], hit.tri[:R], hit.u[:R], hit.v[:R])
    if R % PACKET_SIZE == 0 and _pallas_enabled():
        if _treelet_enabled(scene):
            from experiments.treelet.pipeline import treelet_intersect

            return treelet_intersect(scene, ro, rd, tmax=tmax,
                                     active=active, any_hit=any_hit)
        if _wide_enabled(scene):
            from .pallas_wide import intersect_wide

            return intersect_wide(scene, ro, rd, tmax=tmax, active=active,
                                  any_hit=any_hit)
        from .pallas_intersect import intersect_pallas

        return intersect_pallas(scene, ro, rd, tmax=tmax, active=active,
                                any_hit=any_hit)
    if R % PACKET_SIZE == 0:
        return intersect_packets(scene, ro, rd, tmax=tmax, active=active,
                                 any_hit=any_hit)
    return intersect_rays(scene, ro, rd, tmax=tmax, active=active,
                          any_hit=any_hit)


def occluded(scene, ro, rd, dist, active=None) -> jnp.ndarray:
    """Shadow query: True where the segment [T_MIN, dist) is blocked.

    On TPU this uses a specialized stackless any-hit Pallas kernel (no
    near-first ordering, no best-hit bookkeeping — see
    pallas_intersect._anyhit_kernel); elsewhere the generic any_hit path.
    """
    if getattr(scene, "inst_w2o", None) is not None:
        from ..scene.instanced import occluded_instanced

        return occluded_instanced(scene, ro, rd, dist, active=active)
    R = ro.shape[0]
    tmax = dist * (1.0 - 1e-3)
    if _pallas_enabled():
        from .pallas_intersect import TILE, occluded_pallas

        if _wide_enabled(scene):
            from .pallas_wide import occluded_wide as occluded_pallas  # noqa

        pad = (-R) % TILE
        if pad == 0:
            return occluded_pallas(scene, ro, rd, tmax, active=active)
        if R >= TILE // 2:
            act = jnp.ones(R, jnp.bool_) if active is None else active
            out = occluded_pallas(
                scene,
                jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)]),
                jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)]),
                jnp.concatenate([tmax, jnp.zeros(pad, tmax.dtype)]),
                active=jnp.concatenate([act, jnp.zeros(pad, jnp.bool_)]))
            return out[:R]
    hit = intersect_any(scene, ro, rd, tmax=tmax, active=active,
                        any_hit=True)
    return hit.tri != INVALID_TRI
