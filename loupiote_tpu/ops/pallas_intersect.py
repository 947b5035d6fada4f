"""Pallas TPU traversal kernel: `sub` sub-packet traversals per grid cell.

The speed-of-light analysis (see git history / SURVEY.md §7 hard-parts):
XLA-level traversal is bound by either per-ray gather throughput (~50M
rows/s) or packet-union redundancy. This kernel removes both walls:

  - Whole BVH + leaf-triangle tables live resident in VMEM (v5e has ~128MB
    VMEM; a Sponza-scale scene needs ~45MB padded).
  - One grid cell owns `sub` rows of 128 rays (default sub=32 → 4096 rays
    per cell; 8 rows is the tile-granularity floor). Each row is an
    *independent* sub-packet running its own stack-based traversal: scalar
    control in SMEM/registers, per-row node fetch via a dynamic-sublane
    slice, bounds broadcast lane-wise, so every VPU instruction does useful
    work for `sub` different tree positions at once. More rows per cell
    amortize the fixed per-step loop overhead (device sweep: Cornell
    81.3 ms at sub=8 → 72.1 at sub=32, experiments/cornell_sub.py).
  - A leaf is ONE 128-lane row holding 14 triangles (9 floats each): a
    single dynamic slice fetches a whole leaf; Moller-Trumbore runs as
    (sub,128) dense math with per-row masks.

128-ray sub-packets keep traversal unions ~an order of magnitude tighter
than 1024-ray packets while keeping the VPU fully occupied.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, T_FAR, T_MIN

SUB = 8  # native f32 tile rows; the unit of sub-packet shapes
SUBP = 128  # rays per sub-packet (lanes)
# Production sub-packet rows per grid cell: the round-4 device sweep on
# the Cornell interactive frame measured 81.3 ms (sub=8) -> 80.1 (16)
# -> 72.1 (32) — fixed per-step loop overhead amortizes over more rows,
# same mechanism as the wide kernel's DEFAULT_SUB=64
# (experiments/cornell_sub.py, artifacts/r4_device/cornell_sub.log).
DEFAULT_SUB = 32
TILE = SUB * SUBP
STACK = 64
LEAF_CAP = 14
BIG = 3e30

def _bc(col):
    """(s,1) -> (s,128) lane broadcast."""
    return jax.lax.broadcast_in_dim(col, (col.shape[0], SUBP), (0, 1))


def _tree(fold, xs):
    """Balanced-tree fold — serial accumulation chains are critical-path
    latency in these latency-bound loops (see ops/pallas_wide.py)."""
    xs = list(xs)
    while len(xs) > 1:
        nxt = [fold(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)]
        if len(xs) % 2:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


def _traverse_kernel(node_ref, leaf_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
                     act_ref,
                     t_out, u_out, v_out, tri_out,
                     stack_ref, *, end_index: int, any_hit: bool,
                     max_steps: int, leaf_cap: int = LEAF_CAP,
                     stack: int = STACK):
    sub = ox_ref.shape[1]  # sub-packet rows per grid cell
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0]  # (8,128) int32 0/1 active mask

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    # Majority direction sign per sub-packet (ordered traversal), as int32
    # 0/1 masks — Mosaic can't handle (8,1) bool vectors.
    dpos_i = [(jnp.sum(jnp.sign(d), axis=1, keepdims=True) >= 0.0)
              .astype(jnp.int32) for d in (dx, dy, dz)]  # 3 x (8,1) i32

    t0 = t0_ref[0]

    # Scalar state per sub-packet lives as (8,1) int32 columns; scalar
    # stack ops extract per-row values with static indices.
    node0 = jnp.zeros((sub, 1), jnp.int32)
    ptr0 = jnp.zeros((sub, 1), jnp.int32)
    # Sub-packets with no active ray retire before the first step.
    # (int32 throughout: bool scalar extract is unsupported in Mosaic.)
    done0 = (jnp.sum(act, axis=1, keepdims=True) == 0).astype(jnp.int32)

    def cond(c):
        (node, ptr, done, t, u, v, tri, blocked, steps) = c
        return jnp.logical_and(jnp.sum(done) < sub, steps < max_steps)

    def body(c):
        (node, ptr, done, t, u, v, tri, blocked, steps) = c

        # --- fetch the 8 node rows (dynamic sublane slices).
        rows = [node_ref[pl.ds(jnp.where(done[s, 0] > 0, 0, node[s, 0]), 1), :]
                for s in range(sub)]
        nrow = jnp.concatenate(rows, axis=0)  # (8, 16)

        bminx, bminy, bminz = (_bc(nrow[:, i:i + 1]) for i in range(3))
        bmaxx, bmaxy, bmaxz = (_bc(nrow[:, i:i + 1]) for i in range(3, 6))
        count = lax.bitcast_convert_type(nrow[:, 6:7], jnp.int32)  # (8,1)
        slot8 = lax.bitcast_convert_type(nrow[:, 8:9], jnp.int32)  # right|leaf_row
        slot9 = lax.bitcast_convert_type(nrow[:, 9:10], jnp.int32)  # axis|first

        # --- slab test: 8 different boxes vs their own 128 rays.
        t1x = (bminx - ox) * ix
        t2x = (bmaxx - ox) * ix
        t1y = (bminy - oy) * iy
        t2y = (bmaxy - oy) * iy
        t1z = (bminz - oz) * iz
        t2z = (bmaxz - oz) * iz
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                        jnp.minimum(t1y, t2y)),
                            jnp.minimum(t1z, t2z))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        ray_hit = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < t) & (act > 0)
        if any_hit:
            ray_hit = ray_hit & (blocked == 0)
        ray_hit = ray_hit & (_bc(done) == 0)

        # (8,1) int32 masks throughout — no small bool vectors.
        hit_any_i = (jnp.sum(ray_hit.astype(jnp.int32), axis=1,
                             keepdims=True) > 0).astype(jnp.int32)
        is_leaf_i = (count > 0).astype(jnp.int32)
        do_leaf_i = hit_any_i * is_leaf_i

        # --- leaf processing: fetch each sub-packet's leaf row, run MT on
        # up to 14 triangles with per-row masks.
        leaf_row_idx = do_leaf_i * slot8  # (8,1) int32 (row 0 when inactive)
        lrows = jnp.concatenate(
            [leaf_ref[pl.ds(leaf_row_idx[s, 0], 1), :] for s in range(sub)],
            axis=0)  # (8, 128)
        gfirst = slot9  # (8,1) global first tri (valid for leaves)

        cands = []
        for k in range(leaf_cap):
            base = 9 * k
            p0x = _bc(lrows[:, base + 0: base + 1])
            p0y = _bc(lrows[:, base + 1: base + 2])
            p0z = _bc(lrows[:, base + 2: base + 3])
            e1x = _bc(lrows[:, base + 3: base + 4])
            e1y = _bc(lrows[:, base + 4: base + 5])
            e1z = _bc(lrows[:, base + 5: base + 6])
            e2x = _bc(lrows[:, base + 6: base + 7])
            e2y = _bc(lrows[:, base + 7: base + 8])
            e2z = _bc(lrows[:, base + 8: base + 9])

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

            valid_i = do_leaf_i * (k < count).astype(jnp.int32)  # (8,1)
            ok = ((_bc(valid_i) > 0) & ray_hit
                  & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                  & (tt > T_MIN) & (tt < t))
            cands.append((jnp.where(ok, tt, BIG), uu, vv,
                          _bc(gfirst) + k))

        # Tree-reduce the candidates (the serial select chain was
        # 4*leaf_cap dependent ops on the critical path); strict-< fold
        # keeps the earlier triangle on exact ties, matching the
        # sequential update order.
        def fold(a, b):
            tb = b[0] < a[0]
            return tuple(jnp.where(tb, y, x) for x, y in zip(a, b))

        ct, cu, cv, ctri = _tree(fold, cands)
        upd = ct < t
        new_t = jnp.where(upd, ct, t)
        new_u = jnp.where(upd, cu, u)
        new_v = jnp.where(upd, cv, v)
        new_tri = jnp.where(upd, ctri, tri)
        new_blocked = (jnp.maximum(blocked, upd.astype(jnp.int32))
                       if any_hit else blocked)

        # --- per-sub-packet scalar control (int32 mask arithmetic).
        descend_i = hit_any_i * (1 - is_leaf_i)  # (8,1)
        # Near child: left (node+1) when majority dir along split axis >= 0.
        axis = slot9  # (8,1) split axis for internal nodes
        ax0 = (axis == 0).astype(jnp.int32)
        ax1 = (axis == 1).astype(jnp.int32)
        ax2 = 1 - ax0 - ax1
        ax_pos_i = ax0 * dpos_i[0] + ax1 * dpos_i[1] + ax2 * dpos_i[2]
        left = node + 1
        right = slot8
        near = ax_pos_i * left + (1 - ax_pos_i) * right
        far = ax_pos_i * right + (1 - ax_pos_i) * left

        end = jnp.int32(end_index)
        if any_hit:
            # Rows where every active ray is blocked can retire early.
            n_blocked = jnp.sum(jnp.maximum(new_blocked, 1 - act), axis=1,
                                keepdims=True)  # (8,1)
        nodes_s, ptrs_s, dones_s = [], [], []
        for s in range(sub):
            d_s = descend_i[s, 0] > 0
            ptr_s = ptr[s, 0]
            # Push far child (write is unconditional but only [0, ptr)
            # is ever read, so a non-descending write is harmless).
            stack_ref[s * stack + jnp.minimum(ptr_s, stack - 1)] = far[s, 0]
            can_pop = ptr_s > 0
            popped = stack_ref[s * stack + jnp.maximum(ptr_s - 1, 0)]
            nxt = jnp.where(d_s, near[s, 0],
                            jnp.where(can_pop, popped, end))
            nptr = jnp.where(d_s, jnp.minimum(ptr_s + 1, stack - 1),
                             jnp.maximum(ptr_s - 1, 0))
            fin = (done[s, 0] > 0) | (nxt == end)
            if any_hit:
                fin = fin | (n_blocked[s, 0] >= SUBP)
            nodes_s.append(jnp.where(fin, 0, nxt))
            ptrs_s.append(nptr)
            dones_s.append(fin.astype(jnp.int32))
        new_node = jnp.stack(nodes_s).reshape(sub, 1)
        new_ptr = jnp.stack(ptrs_s).reshape(sub, 1)
        new_done = jnp.stack(dones_s).reshape(sub, 1)

        return (new_node, new_ptr, new_done, new_t, new_u, new_v, new_tri,
                new_blocked, steps + 1)

    init = (node0, ptr0, done0, t0,
            jnp.zeros((sub, SUBP), jnp.float32),
            jnp.zeros((sub, SUBP), jnp.float32),
            jnp.full((sub, SUBP), -1, jnp.int32),
            jnp.zeros((sub, SUBP), jnp.int32),  # blocked as i32 (Mosaic
            jnp.int32(0))                        # can't carry i1 vectors)
    out = lax.while_loop(cond, body, init)
    (_, _, _, t, u, v, tri, blocked, _) = out
    t_out[0] = t
    u_out[0] = u
    v_out[0] = v
    tri_out[0] = tri


def _anyhit_kernel(node_ref, leaf_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
                   act_ref, blocked_out, *, end_index: int, max_steps: int,
                   leaf_cap: int = LEAF_CAP):
    """Shadow-ray (any-hit) specialized traversal (VERDICT r1 item 3).

    Differences vs the closest-hit kernel that make it much cheaper per
    step: STACKLESS control via the threaded miss links (no near-first
    ordering — ordering only helps best-t pruning, which shadow rays don't
    do), so the whole per-step control is (8,1) int vector math with zero
    scalar stack traffic; no t/u/v/tri bookkeeping (one blocked bit per
    ray); rows retire as soon as every active lane is blocked. Callers
    bound rays by light distance or scene-exit t (ops/shade.py).
    """
    sub = ox_ref.shape[1]  # sub-packet rows per grid cell
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0]  # (8,128) int32 0/1

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    t0 = t0_ref[0]

    node0 = jnp.zeros((sub, 1), jnp.int32)
    done0 = (jnp.sum(act, axis=1, keepdims=True) == 0).astype(jnp.int32)
    end = jnp.int32(end_index)

    def cond(c):
        node, done, blocked, steps = c
        return jnp.logical_and(jnp.sum(done) < sub, steps < max_steps)

    def body(c):
        node, done, blocked, steps = c
        rows = [node_ref[pl.ds(jnp.where(done[s, 0] > 0, 0, node[s, 0]), 1), :]
                for s in range(sub)]
        nrow = jnp.concatenate(rows, axis=0)  # (8, 16)
        bminx, bminy, bminz = (_bc(nrow[:, i:i + 1]) for i in range(3))
        bmaxx, bmaxy, bmaxz = (_bc(nrow[:, i:i + 1]) for i in range(3, 6))
        count = lax.bitcast_convert_type(nrow[:, 6:7], jnp.int32)
        miss = lax.bitcast_convert_type(nrow[:, 7:8], jnp.int32)
        slot8 = lax.bitcast_convert_type(nrow[:, 8:9], jnp.int32)

        t1x = (bminx - ox) * ix
        t2x = (bmaxx - ox) * ix
        t1y = (bminy - oy) * iy
        t2y = (bmaxy - oy) * iy
        t1z = (bminz - oz) * iz
        t2z = (bmaxz - oz) * iz
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                        jnp.minimum(t1y, t2y)),
                            jnp.minimum(t1z, t2z))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        ray_hit = ((tfar >= jnp.maximum(tnear, 0.0)) & (tnear < t0)
                   & (act > 0) & (blocked == 0) & (_bc(done) == 0))
        hit_any_i = (jnp.sum(ray_hit.astype(jnp.int32), axis=1,
                             keepdims=True) > 0).astype(jnp.int32)
        is_leaf_i = (count > 0).astype(jnp.int32)
        do_leaf_i = hit_any_i * is_leaf_i

        leaf_row_idx = do_leaf_i * slot8
        lrows = jnp.concatenate(
            [leaf_ref[pl.ds(leaf_row_idx[s, 0], 1), :] for s in range(sub)],
            axis=0)

        oks = []
        for k in range(leaf_cap):
            base = 9 * k
            p0x = _bc(lrows[:, base + 0: base + 1])
            p0y = _bc(lrows[:, base + 1: base + 2])
            p0z = _bc(lrows[:, base + 2: base + 3])
            e1x = _bc(lrows[:, base + 3: base + 4])
            e1y = _bc(lrows[:, base + 4: base + 5])
            e1z = _bc(lrows[:, base + 5: base + 6])
            e2x = _bc(lrows[:, base + 6: base + 7])
            e2y = _bc(lrows[:, base + 7: base + 8])
            e2z = _bc(lrows[:, base + 8: base + 9])

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

            valid_i = do_leaf_i * (k < count).astype(jnp.int32)
            ok = ((_bc(valid_i) > 0) & ray_hit
                  & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                  & (tt > T_MIN) & (tt < t0))
            oks.append(ok.astype(jnp.int32))
        new_blocked = jnp.maximum(blocked, _tree(jnp.maximum, oks))

        # Stackless, fully vectorized control: descend or follow miss link.
        descend_i = hit_any_i * (1 - is_leaf_i)  # (8,1)
        nxt = descend_i * (node + 1) + (1 - descend_i) * miss
        n_blocked = jnp.sum(jnp.maximum(new_blocked, 1 - act), axis=1,
                            keepdims=True)
        fin = ((done > 0) | (nxt >= end)
               | (n_blocked >= SUBP)).astype(jnp.int32)
        new_node = (1 - fin) * nxt
        return new_node, fin, new_blocked, steps + 1

    init = (node0, done0, jnp.zeros((sub, SUBP), jnp.int32), jnp.int32(0))
    _, _, blocked, _ = lax.while_loop(cond, body, init)
    blocked_out[0] = blocked


@functools.partial(jax.jit,
                   static_argnames=("end_index", "num_nodes", "interpret",
                                    "leaf_cap"))
def _pallas_anyhit(node_rows, leaf_rows, ox, oy, oz, dx, dy, dz, t0, act,
                   *, end_index: int, num_nodes: int,
                   interpret: bool = False, leaf_cap: int = LEAF_CAP):
    G, sub = ox.shape[0], ox.shape[1]
    kernel = functools.partial(_anyhit_kernel, end_index=end_index,
                               leaf_cap=leaf_cap,
                               max_steps=4 * num_nodes + 64)
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, sub, SUBP), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec((1, sub, SUBP), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)],
    )
    (blocked,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, sub, SUBP), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(node_rows, leaf_rows, ox, oy, oz, dx, dy, dz, t0, act)
    return blocked


def _sub_rows(sub, n_rays=None):
    import os as _os

    if sub is None:
        sub = int(_os.environ.get("LOUPIOTE_BVH2_SUB", DEFAULT_SUB))
    if n_rays is not None:
        # Never pad a small wave past one grid cell: clamp to the wave's
        # own row count (rounded up to the native 8-row f32 tile).
        rows = -(-int(n_rays) // SUBP)
        sub = max(SUB, min(sub, -(-rows // SUB) * SUB))
    return sub


def _pad_rays(sub, ro, rd, t0, act):
    """Pad the wave to a multiple of sub*128 with inactive lanes."""
    R0 = ro.shape[0]
    tile = sub * SUBP
    R = -(-R0 // tile) * tile
    if R != R0:
        pad = R - R0
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        rd = jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)])
        t0 = jnp.concatenate([t0, jnp.zeros(pad, t0.dtype)])
        act = jnp.concatenate([act, jnp.zeros(pad, act.dtype)])
    return R, ro, rd, t0, act


def occluded_pallas(scene, ro, rd, tmax, active=None,
                    interpret: bool = False,
                    sub: int | None = None) -> jnp.ndarray:
    """(R,) bool: segment [T_MIN, tmax) blocked — via the any-hit kernel."""
    sub = _sub_rows(sub, ro.shape[0])
    R0 = ro.shape[0]
    act = (jnp.ones(R0, jnp.int32) if active is None
           else active.astype(jnp.int32))
    R, ro, rd, t0, act = _pad_rays(sub, ro, rd, tmax, act)
    G = R // (sub * SUBP)

    def shape(x):
        return x.reshape(G, sub, SUBP)

    blocked = _pallas_anyhit(
        scene.node_rows, scene.leaf_rows,
        shape(ro[:, 0]), shape(ro[:, 1]), shape(ro[:, 2]),
        shape(rd[:, 0]), shape(rd[:, 1]), shape(rd[:, 2]),
        shape(t0), shape(act),
        end_index=int(scene.end_index), num_nodes=int(scene.num_nodes),
        interpret=interpret,
        leaf_cap=int(getattr(scene, "leaf_cap", LEAF_CAP)))
    out = blocked.reshape(R)[:R0] > 0
    if active is not None:
        out = out & active
    return out


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "end_index", "num_nodes",
                                    "interpret", "leaf_cap", "stack_depth"))
def _pallas_trace(node_rows, leaf_rows, ox, oy, oz, dx, dy, dz, t0, act,
                  *, any_hit: bool, end_index: int, num_nodes: int,
                  interpret: bool = False, leaf_cap: int = LEAF_CAP,
                  stack_depth: int = STACK):
    G, sub = ox.shape[0], ox.shape[1]
    kernel = functools.partial(_traverse_kernel, end_index=end_index,
                               any_hit=any_hit, leaf_cap=leaf_cap,
                               max_steps=4 * num_nodes + 64,
                               stack=stack_depth)
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # node_rows (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # leaf_rows (whole)
        ] + [pl.BlockSpec((1, sub, SUBP), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec((1, sub, SUBP), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.SMEM((sub * stack_depth,), jnp.int32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, sub, SUBP), jnp.float32),
        jax.ShapeDtypeStruct((G, sub, SUBP), jnp.float32),
        jax.ShapeDtypeStruct((G, sub, SUBP), jnp.float32),
        jax.ShapeDtypeStruct((G, sub, SUBP), jnp.int32),
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
    )(node_rows, leaf_rows, ox, oy, oz, dx, dy, dz, t0, act)
    return t, u, v, tri


def intersect_pallas(scene, ro, rd, tmax=None, active=None,
                     any_hit: bool = False, interpret: bool = False,
                     sub: int | None = None) -> Hit:
    """Hit-compatible wrapper over the Pallas traversal kernel."""
    sub = _sub_rows(sub, ro.shape[0])
    R0 = ro.shape[0]
    t0 = jnp.full(R0, T_FAR, jnp.float32) if tmax is None else tmax
    act = (jnp.ones(R0, jnp.int32) if active is None
           else active.astype(jnp.int32))
    R, ro, rd, t0, act = _pad_rays(sub, ro, rd, t0, act)
    G = R // (sub * SUBP)

    def shape(x):
        return x.reshape(G, sub, SUBP)

    t, u, v, tri = _pallas_trace(
        scene.node_rows, scene.leaf_rows,
        shape(ro[:, 0]), shape(ro[:, 1]), shape(ro[:, 2]),
        shape(rd[:, 0]), shape(rd[:, 1]), shape(rd[:, 2]),
        shape(t0), shape(act),
        any_hit=any_hit, end_index=int(scene.end_index),
        num_nodes=int(scene.num_nodes), interpret=interpret,
        leaf_cap=int(getattr(scene, "leaf_cap", LEAF_CAP)),
        stack_depth=int(getattr(scene, "stack_depth", STACK)))

    tri = tri.reshape(R)[:R0]
    if active is not None:
        tri = jnp.where(active, tri, -1)
    return Hit(t.reshape(R)[:R0], tri, u.reshape(R)[:R0],
               v.reshape(R)[:R0])
