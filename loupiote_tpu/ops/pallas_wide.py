"""Pallas TPU wide-BVH (8-ary) sub-packet traversal kernel.

Successor of ops/pallas_intersect.py's BVH2 kernel, measured to be
*latency-bound* on its per-step dependency chain rather than
VPU-throughput-bound (experiments/step_cost.py: a 14x cut of the leaf
Moller-Trumbore unroll changed diffuse-wave time <8%). Design response:

  - ONE unified row table (accel/wide.py): a step fetches one 128-lane row
    per sub-packet that is either 8 child AABBs (internal) or 14 triangles
    (leaf) — 8 dynamic slices per step total vs 16 before, and each
    internal step advances the tree ~3 levels' worth.
  - Both interpretations of the fetched row are evaluated every step and
    masked per sub-packet (vector flops hide under the fetch/control
    latency bubbles; measured free).
  - Fully vectorized control: per-row stacks live in an (8, S) int32 loop
    carry manipulated with one-hot lane masks — zero scalar stack ops.
  - Ordered descent: children are pushed far-to-near by per-row min
    hit-tnear, so the near child pops first (best-t pruning).

Reference behavior parity: IntersectorPass over full-resolution ray SSBOs
(`/root/reference/crates/lib/src/renderer.rs:453-464,484-510`); the wide
layout mirrors the reference's CWBVH (tinybvh) choice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, T_FAR, T_MIN

SUB = 8  # sub-packets per grid cell (sublane rows)
SUBP = 128  # rays per sub-packet (lanes)
TILE = SUB * SUBP
WIDTH = 8  # children per wide node
LEAF_CAP = 14
BIG = 3e30  # python float: jnp scalars would be captured consts in pallas


def _bc(col):
    """(8,1) -> (8,128) lane broadcast."""
    return jax.lax.broadcast_in_dim(col, (SUB, SUBP), (0, 1))


def _rowsum(x):
    return jnp.sum(x, axis=1, keepdims=True)


def _wide_kernel(rows_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
                 act_ref,
                 t_out, u_out, v_out, tri_out,
                 *, end_index: int, any_hit: bool, max_steps: int,
                 leaf_cap: int, stack_size: int):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0]  # (8,128) int32 0/1
    t0 = t0_ref[0]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    END = jnp.int32(end_index)
    lane_s = lax.broadcasted_iota(jnp.int32, (SUB, stack_size), 1)
    c_iota = lax.broadcasted_iota(jnp.int32, (SUB, WIDTH), 1)

    cur0 = jnp.zeros((SUB, 1), jnp.int32)
    ptr0 = jnp.zeros((SUB, 1), jnp.int32)
    done0 = (jnp.sum(act, axis=1, keepdims=True) == 0).astype(jnp.int32)
    stack0 = jnp.zeros((SUB, stack_size), jnp.int32)

    def cond(c):
        (cur, ptr, done, stack, t, u, v, tri, blocked, steps) = c
        return jnp.logical_and(jnp.sum(done) < SUB, steps < max_steps)

    def body(c):
        (cur, ptr, done, stack, t, u, v, tri, blocked, steps) = c

        rows = [rows_ref[pl.ds(jnp.where(done[s, 0] > 0, 0, cur[s, 0]), 1), :]
                for s in range(SUB)]
        rs = jnp.concatenate(rows, axis=0)  # (8, 128)

        kind = lax.bitcast_convert_type(rs[:, 127:128], jnp.int32)  # (8,1)
        live = 1 - done
        is_leaf = (kind == 1).astype(jnp.int32) * live  # (8,1) i32
        is_node = (1 - (kind == 1).astype(jnp.int32)) * live

        lane_act = (act > 0) & (_bc(done) == 0)
        if any_hit:
            lane_act = lane_act & (blocked == 0)

        # ---- leaf interpretation (masked by is_leaf). -----------------
        fc = lax.bitcast_convert_type(rs[:, 126:127], jnp.int32)
        lcount = fc & 15
        lfirst = fc >> 4
        new_t, new_u, new_v, new_tri = t, u, v, tri
        new_blocked = blocked
        leaf_lane = lane_act & (_bc(is_leaf) > 0)
        for k in range(leaf_cap):
            b = 9 * k
            p0x, p0y, p0z = (_bc(rs[:, b + i:b + i + 1]) for i in range(3))
            e1x, e1y, e1z = (_bc(rs[:, b + i:b + i + 1]) for i in range(3, 6))
            e2x, e2y, e2z = (_bc(rs[:, b + i:b + i + 1]) for i in range(6, 9))

            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

            valid = _bc(is_leaf * (k < lcount).astype(jnp.int32)) > 0
            ok = (valid & leaf_lane
                  & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                  & (tt > T_MIN) & (tt < new_t))
            new_t = jnp.where(ok, tt, new_t)
            new_u = jnp.where(ok, uu, new_u)
            new_v = jnp.where(ok, vv, new_v)
            new_tri = jnp.where(ok, _bc(lfirst) + k, new_tri)
            if any_hit:
                new_blocked = jnp.maximum(new_blocked, ok.astype(jnp.int32))

        # ---- internal interpretation: 8 child slabs. ------------------
        node_lane = lane_act & (_bc(is_node) > 0)
        hits, tmins, ptrs = [], [], []
        for ci in range(WIDTH):
            b = 16 * ci
            bminx, bminy, bminz = (_bc(rs[:, b + i:b + i + 1])
                                   for i in range(3))
            bmaxx, bmaxy, bmaxz = (_bc(rs[:, b + i:b + i + 1])
                                   for i in range(3, 6))
            cptr = lax.bitcast_convert_type(rs[:, b + 6:b + 7], jnp.int32)

            t1x = (bminx - ox) * ix
            t2x = (bmaxx - ox) * ix
            t1y = (bminy - oy) * iy
            t2y = (bmaxy - oy) * iy
            t1z = (bminz - oz) * iz
            t2z = (bmaxz - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                         jnp.minimum(t1y, t2y)),
                             jnp.minimum(t1z, t2z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                         jnp.maximum(t1y, t2y)),
                             jnp.maximum(t1z, t2z))
            pr = new_t if not any_hit else t0
            rhit = (tf >= jnp.maximum(tn, 0.0)) & (tn < pr) & node_lane
            # One reduce per child: the min-tnear doubles as the hit test.
            ctmin = jnp.min(jnp.where(rhit, tn, BIG), axis=1, keepdims=True)
            chit = ((ctmin < BIG) & (cptr >= 0)).astype(jnp.int32)  # (8,1)
            hits.append(chit)
            tmins.append(ctmin)
            ptrs.append(cptr)
        H = jnp.concatenate(hits, axis=1)  # (8,8) i32
        TN = jnp.concatenate(tmins, axis=1)  # (8,8) f32
        P = jnp.concatenate(ptrs, axis=1)  # (8,8) i32

        nchild = _rowsum(H)  # (8,1)
        descend = (nchild > 0).astype(jnp.int32) * is_node  # (8,1)

        # One-shot ordered push (no serial selection loop — the per-step
        # critical path is what the whole kernel is latency-bound on).
        # rank_c = number of hit children strictly nearer than c (ties by
        # index); nearest (rank 0) is the descend target, the rest scatter
        # into the stack far-to-near in a single batched one-hot write.
        def _bw(col):  # (8,1) -> (8,WIDTH)
            return jax.lax.broadcast_in_dim(col, (SUB, WIDTH), (0, 1))

        rank = jnp.zeros((SUB, WIDTH), jnp.int32)
        for cp in range(WIDTH):
            tn_cp = TN[:, cp:cp + 1]  # (8,1)
            nearer = ((_bw(tn_cp) < TN)
                      | ((_bw(tn_cp) == TN) & (cp < c_iota)))
            rank = rank + (nearer
                           & (_bw(H[:, cp:cp + 1]) > 0)).astype(jnp.int32)

        sel0 = H * (rank == 0).astype(jnp.int32)  # (8,WIDTH)
        near_ptr = _rowsum(sel0 * P)  # (8,1)

        # Push positions: ptr + (nchild - 1 - rank) for hit children with
        # rank >= 1, rows that descend only.
        push_c = H * (rank >= 1).astype(jnp.int32) * _bw(descend)
        pos_c = _bw(ptr) + _bw(nchild) - 1 - rank  # (8,WIDTH)
        delta = jnp.zeros((SUB, stack_size), jnp.int32)
        written = jnp.zeros((SUB, stack_size), jnp.int32)
        for ci in range(WIDTH):
            onehot = ((lane_s == jax.lax.broadcast_in_dim(
                pos_c[:, ci:ci + 1], (SUB, stack_size), (0, 1)))
                & (jax.lax.broadcast_in_dim(
                    push_c[:, ci:ci + 1], (SUB, stack_size), (0, 1)) > 0)
            ).astype(jnp.int32)
            delta = delta + onehot * jax.lax.broadcast_in_dim(
                P[:, ci:ci + 1], (SUB, stack_size), (0, 1))
            written = written + onehot
        new_stack = stack * (1 - written) + delta
        pos = ptr + descend * jnp.maximum(nchild - 1, 0)

        # Pop path (leaf rows and no-hit internal rows).
        can_pop = (pos > 0).astype(jnp.int32)
        top = jax.lax.broadcast_in_dim(jnp.maximum(pos - 1, 0),
                                       (SUB, stack_size), (0, 1))
        popped = _rowsum(jnp.where(lane_s == top, new_stack, 0))  # (8,1)

        nxt = jnp.where(descend > 0, near_ptr,
                        jnp.where(can_pop > 0, popped, END))
        new_ptr = jnp.where(descend > 0, pos, jnp.maximum(pos - 1, 0))
        fin = (done > 0) | (nxt >= END)
        if any_hit:
            n_blocked = _rowsum(jnp.maximum(new_blocked, 1 - act))
            fin = fin | (n_blocked >= SUBP)
        fin = fin.astype(jnp.int32)
        new_cur = (1 - fin) * nxt

        return (new_cur, new_ptr, fin, new_stack,
                new_t, new_u, new_v, new_tri, new_blocked, steps + 1)

    init = (cur0, ptr0, done0, stack0, t0,
            jnp.zeros((SUB, SUBP), jnp.float32),
            jnp.zeros((SUB, SUBP), jnp.float32),
            jnp.full((SUB, SUBP), -1, jnp.int32),
            jnp.zeros((SUB, SUBP), jnp.int32),
            jnp.int32(0))
    out = lax.while_loop(cond, body, init)
    (_, _, _, _, t, u, v, tri, blocked, _) = out
    if any_hit:
        t_out[0] = t
        u_out[0] = u
        v_out[0] = v
        tri_out[0] = jnp.maximum(blocked, jnp.where(tri >= 0, 1, 0))
    else:
        t_out[0] = t
        u_out[0] = u
        v_out[0] = v
        tri_out[0] = tri


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "end_index", "interpret",
                                    "leaf_cap", "stack_size", "max_steps"))
def _wide_trace(trav_rows, ox, oy, oz, dx, dy, dz, t0, act,
                *, any_hit: bool, end_index: int, max_steps: int,
                interpret: bool = False, leaf_cap: int = LEAF_CAP,
                stack_size: int = 64):
    G = ox.shape[0]
    kernel = functools.partial(_wide_kernel, end_index=end_index,
                               any_hit=any_hit, leaf_cap=leaf_cap,
                               max_steps=max_steps, stack_size=stack_size)
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # trav_rows (whole)
        ] + [pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.float32),
        jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.float32),
        jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.float32),
        jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.int32),
    ]
    t, u, v, tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(trav_rows, ox, oy, oz, dx, dy, dz, t0, act)
    return t, u, v, tri


def intersect_wide(scene, ro, rd, tmax=None, active=None,
                   any_hit: bool = False, interpret: bool = False) -> Hit:
    """Hit-compatible wrapper over the wide-BVH traversal kernel.

    Requires ``scene.trav_rows`` (built by accel/wide.py via
    scene/buffers.py).
    """
    R = ro.shape[0]
    assert R % TILE == 0, f"ray count {R} must be a multiple of {TILE}"
    G = R // TILE

    def shape(x):
        return x.reshape(G, SUB, SUBP)

    t0 = jnp.full(R, T_FAR, jnp.float32) if tmax is None else tmax
    act = (jnp.ones(R, jnp.int32) if active is None
           else active.astype(jnp.int32))

    t, u, v, tri = _wide_trace(
        scene.trav_rows,
        shape(ro[:, 0]), shape(ro[:, 1]), shape(ro[:, 2]),
        shape(rd[:, 0]), shape(rd[:, 1]), shape(rd[:, 2]),
        shape(t0), shape(act),
        any_hit=any_hit, end_index=int(scene.wide_end),
        max_steps=4 * int(scene.wide_end) + 64,
        interpret=interpret,
        leaf_cap=int(getattr(scene, "leaf_cap", LEAF_CAP)),
        stack_size=int(scene.wide_stack))

    tri = tri.reshape(R)
    if active is not None:
        tri = jnp.where(active, tri, -1)
    return Hit(t.reshape(R), tri, u.reshape(R), v.reshape(R))


def occluded_wide(scene, ro, rd, tmax, active=None,
                  interpret: bool = False) -> jnp.ndarray:
    """(R,) bool: segment [T_MIN, tmax) blocked — wide any-hit variant."""
    hit = intersect_wide(scene, ro, rd, tmax=tmax, active=active,
                         any_hit=True, interpret=interpret)
    out = hit.tri > 0
    if active is not None:
        out = out & active
    return out
