"""Pallas TPU wide-BVH (8-ary) traversal kernel with deferred leaf batching.

Measured cost model (REVISED round 3, experiments/{order_ab,flush_census,
sub_ab,stack_ab}.py on a v5e chip): the per-step cost is STRUCTURAL, not
compute — duplicating the MT math costs +3%, duplicating the dynamic row
fetches (un-CSE-able variant) +0%, removing the rank matrix +0%, and the
vector->scalar extract count barely matters. What does move the needle:
rows per grid cell (fixed per-step overhead amortizes: 342 -> 269 ns/ray
from sub 8 -> 32, hence DEFAULT_SUB), flushing without a branch, and
unrolling the while body (each a few %%). The round-2 "VPU-op-bound at
~1.2us/step" model is dead; spend ops freely, fight steps and loop
structure. Design response:

  - ONE unified row table (accel/wide.py): internal rows hold 8 child
    AABBs; leaf rows hold 14 triangles. Child pointers carry a LEAF tag
    bit so control never needs to fetch a row to learn its kind.
  - DEFERRED LEAVES: a sub-packet reaching a leaf parks it in a per-row
    ``pend`` slot and keeps traversing internal nodes (cheap steps). When
    any row would need a second slot (or retires with one), a single
    ``pl.when``-gated flush step intersects ALL parked leaf rows at once —
    amortizing the expensive MT block over up to 8 leaf visits. Best-hit
    state (t/u/v/tri) lives in the output refs so the flush can update it
    from inside the conditional; stale-t pruning between flushes is
    conservative and exact at the triangle test.
  - Fully vectorized control: per-row stacks in an (8, S) int32 loop carry
    via one-hot lane masks; octant-order descent — children sit at
    direction-coded slots (accel/wide.py::_octant_slots) so the
    near-to-far priority is ``slot ^ octant(mean ray dir)``, hoisted out
    of the loop (the per-step pairwise-tnear rank matrix it replaces
    measured ~580 ns of the ~1.2 us step, experiments/ablate_step.py).
  - Fetch cost is hidden (measured): a "nofetch" probe ran at the same
    per-step cost as the real kernel.

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

SUB = 8  # native f32 tile rows; the unit of sub-packet shapes
SUBP = 128  # rays per sub-packet (lanes)
TILE = SUB * SUBP
# Production rows per grid cell: more rows amortize the fixed per-step
# loop cost (measured: 342 -> 221 ns/ray from sub 8 -> 64 with the
# branchless flush + 2x unroll, experiments/{sub_ab,best_config}.py;
# every compute/fetch/extract census came back ~free, so the step cost
# is structural).
DEFAULT_SUB = 64
WIDTH = 8  # children per wide node
LEAF_CAP = 14
BIG = 3e30  # python float: jnp scalars would be captured consts in pallas
LEAF_TAG = 1 << 30
LEAF_MASK = LEAF_TAG - 1


def _bc(col):
    """(s,1) -> (s,128) lane broadcast."""
    return jax.lax.broadcast_in_dim(col, (col.shape[0], SUBP), (0, 1))


def _rowsum(x):
    return jnp.sum(x, axis=1, keepdims=True)


def _tree(fold, xs):
    """Balanced-tree fold: turns an n-term accumulation chain (n serial
    dependent ops) into a depth-log2(n) tree. The step cost of this
    kernel is dependency-chain latency, not op count (ROADMAP round-3
    censuses) — serial accumulations belong on no critical path."""
    xs = list(xs)
    while len(xs) > 1:
        nxt = [fold(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)]
        if len(xs) % 2:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


def _moller_trumbore(rs, ray, mask_col, t_best, leaf_cap, any_hit,
                     blocked_ref):
    """Intersect each row's 14-triangle leaf row against its 128 rays.

    ``rs``: (8,128) leaf rows; ``mask_col``: (8,1) int32 row-valid;
    ``t_best``/the returned tuple are (8,128) best-hit accumulators.
    Only t and the triangle id are tracked — barycentrics for the winning
    triangle are recomputed once outside the kernel (recompute_uv), which
    drops two (8,128) select chains per unrolled triangle.
    """
    (ox, oy, oz, dx, dy, dz, _, _, _, t0, act) = ray
    fc = lax.bitcast_convert_type(rs[:, 126:127], jnp.int32)
    lcount = fc & 15
    lfirst = fc >> 4

    t, tri = t_best
    lane_ok = (act > 0) & (_bc(mask_col) > 0)
    if any_hit:
        lane_ok = lane_ok & (blocked_ref[...] == 0)
    cands = []  # per-triangle (candidate t, candidate tri) or ok-int
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

        valid = _bc((k < lcount).astype(jnp.int32)) > 0
        ok = (valid & lane_ok
              & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > T_MIN) & (tt < t))
        if any_hit:
            # Shadow rays need one bit, not best-hit bookkeeping.
            cands.append(ok.astype(jnp.int32))
        else:
            cands.append((jnp.where(ok, tt, BIG), _bc(lfirst) + k))
    # Tree-reduce the per-triangle candidates (the serial
    # t/tri-select chain was 2*leaf_cap dependent ops on the critical
    # path). Strict-< fold keeps the earlier triangle on exact ties —
    # identical to the sequential update order.
    if any_hit:
        blocked_ref[...] = jnp.maximum(blocked_ref[...],
                                       _tree(jnp.maximum, cands))
    else:
        def fold(a, b):
            take_b = b[0] < a[0]
            return (jnp.where(take_b, b[0], a[0]),
                    jnp.where(take_b, b[1], a[1]))

        ct, ctri = _tree(fold, cands)
        upd = ct < t
        t = jnp.where(upd, ct, t)
        tri = jnp.where(upd, ctri, tri)
    return t, tri


def _wide_kernel(rows_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
                 act_ref,
                 t_out, tri_out,
                 *, end_index: int, any_hit: bool, max_steps: int,
                 leaf_cap: int, stack_size: int,
                 flush_fill: int = 6, ablate: str = "", width: int = WIDTH,
                 leaf_rows: int = 1):
    END = jnp.int32(end_index)
    # Sub-packet rows per grid cell: derived from the block shape. 8 is
    # the native f32 tile; 16/32 amortize the fixed per-step loop
    # overhead over more rays (see ROADMAP round-3 overhead census).
    sub = ox_ref.shape[1]
    lane_s = lax.broadcasted_iota(jnp.int32, (sub, stack_size), 1)
    c_iota = lax.broadcasted_iota(jnp.int32, (sub, width), 1)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0]  # (8,128) int32 0/1
    t0 = t0_ref[0]
    ray = (ox, oy, oz, dx, dy, dz,
           safe_inv(dx), safe_inv(dy), safe_inv(dz), t0, act)

    # Octant-order descent (loop-invariant, hoisted): children sit at
    # direction-coded slots (accel/wide.py::_octant_slots), so the
    # near-to-far priority of child slot c for this sub-packet is just
    # c ^ octant(mean ray dir) — no per-step pairwise-tnear matrix
    # (which the ablation census measured at ~580 ns of the ~1.2 us
    # step). Order affects step counts only, never results.
    am = act.astype(jnp.float32)
    o_row = ((jnp.sum(dx * am, axis=1, keepdims=True) < 0)
             .astype(jnp.int32)
             + 2 * (jnp.sum(dy * am, axis=1, keepdims=True) < 0)
             .astype(jnp.int32)
             + 4 * (jnp.sum(dz * am, axis=1, keepdims=True) < 0)
             .astype(jnp.int32))  # (8,1)
    o_bc = jax.lax.broadcast_in_dim(o_row, (sub, width), (0, 1))
    if width == WIDTH:
        prio = c_iota ^ o_bc
    else:
        # 16-ary: slot s & 7 is the octant code, s >> 3 the intra-octant
        # pair (the builder puts the more direction-extreme sibling at
        # pair 0) — visit pairs near-to-far, pair-0 member first.
        prio = 2 * ((c_iota & 7) ^ o_bc) + (c_iota >> 3)
    # prio is a per-row bijection on [0,width): ranks derived from it are
    # unique. Pairwise "is nearer" masks, one per child column.
    prio_lt = [(jax.lax.broadcast_in_dim(prio[:, cp:cp + 1],
                                         (sub, width), (0, 1)) < prio)
               for cp in range(width)]
    init = (
        jnp.zeros((sub, 1), jnp.int32),  # cur (root = row 0)
        jnp.zeros((sub, 1), jnp.int32),  # ptr
        (jnp.sum(act, axis=1, keepdims=True) == 0).astype(jnp.int32),
        jnp.zeros((sub, stack_size), jnp.int32),  # stack
        jnp.full((sub, 1), -1, jnp.int32),  # pendA (parked leaf row)
        jnp.full((sub, 1), -1, jnp.int32),  # pendB (second slot)
    )
    # Best-hit state lives in the output refs (updated under pl.when).
    t_out[0] = t0
    tri_out[0] = (jnp.zeros((sub, SUBP), jnp.int32) if any_hit
                  else jnp.full((sub, SUBP), -1, jnp.int32))

    def advance(st):
        (ox, oy, oz, dx, dy, dz, ix, iy, iz, t0, act) = ray
        (cur, ptr, done, stack, pendA, pendB) = st
        t_ref, tri_ref = t_out.at[0], tri_out.at[0]

        live = 1 - done
        leafbit = (cur >> 30) & 1  # (8,1): parked-at-leaf rows
        retire = (cur == END).astype(jnp.int32)
        occ = (pendA >= 0).astype(jnp.int32)
        occB = (pendB >= 0).astype(jnp.int32)
        stall = occ * jnp.minimum(leafbit + retire, 1) * live
        # Flush when a row is blocked on its pend slot, or when enough rows
        # hold a pending leaf that one MT block amortizes well.
        flush = jnp.logical_or(jnp.sum(stall) > 0,
                               jnp.sum(occ * live) >= flush_fill)

        # ---- flush: intersect all parked leaf rows at once. ------------
        def do_flush():
            if "flushfetch" in ablate:  # census: traced-but-always-0 addrs
                rows2 = jnp.concatenate(
                    [rows_ref[pl.ds(jnp.maximum(pendA[s, 0] * 0, 0), 1), :]
                     for s in range(sub)], axis=0)
            else:
                pmax = jnp.maximum(pendA, 0)  # (sub,1): 1 extract per row
                rows2 = jnp.concatenate(
                    [rows_ref[pl.ds(pmax[s, 0], 1), :]
                     for s in range(sub)], axis=0)
            if "mtless" in ablate:  # census: fetches kept, MT math dropped
                t_ref[...] = t_ref[...] - 1e-7 * jnp.abs(rows2[:, 0:1])
                return
            best_tri = (jnp.zeros((sub, SUBP), jnp.int32) if any_hit
                        else tri_ref[...])
            nt, ntri = _moller_trumbore(
                rows2, ray, occ, (t_ref[...], best_tri),
                leaf_cap, any_hit, tri_ref if any_hit else None)
            # Multi-row leaves: rows pend+1..pend+lrn-1 hold the leaf's
            # remaining triangles (each row self-describing; empty tail
            # rows carry count 0). Extra MT math is nearly free under the
            # latency-bound cost model (x2 measured +3%); the fetches are
            # address-derived, riding the same chain position.
            pmax = jnp.maximum(pendA, 0)
            for j in range(1, leaf_rows):
                rows2j = jnp.concatenate(
                    [rows_ref[pl.ds(pmax[s, 0] + j, 1), :]
                     for s in range(sub)], axis=0)
                nt, ntri = _moller_trumbore(
                    rows2j, ray, occ, (nt, ntri),
                    leaf_cap, any_hit, tri_ref if any_hit else None)
            # Second pend slot (filled by the leaf-draining pop phase).
            pmaxB = jnp.maximum(pendB, 0)
            for j in range(leaf_rows):
                rows2b = jnp.concatenate(
                    [rows_ref[pl.ds(pmaxB[s, 0] + j, 1), :]
                     for s in range(sub)], axis=0)
                nt, ntri = _moller_trumbore(
                    rows2b, ray, occB, (nt, ntri),
                    leaf_cap, any_hit, tri_ref if any_hit else None)
            # Census duplication (results provably unchanged: re-testing
            # the same triangles against the already-updated t finds no
            # strictly-closer hit, so the second pass is a timing-only
            # redundancy the compiler cannot fold).
            if "mt2x" in ablate and not any_hit:
                nt, ntri = _moller_trumbore(
                    rows2, ray, occ, (nt, ntri), leaf_cap, False, None)
            if "fetch2x" in ablate and not any_hit:
                rows2c = jnp.concatenate(
                    [rows_ref[pl.ds(jnp.maximum(pendA[s, 0], 0), 1), :]
                     for s in range(sub)], axis=0)
                nt, ntri = _moller_trumbore(
                    rows2c, ray, occ, (nt, ntri), leaf_cap, False, None)
            t_ref[...] = nt
            if not any_hit:
                tri_ref[...] = ntri

        # Branchless flush is the DEFAULT (best_config.py): the MT math
        # is latency-shadowed anyway, and flushing every step removes
        # both the scalar branch and all pend-stall steps. ablate="when"
        # restores the pl.when-gated flush for A/B.
        if "flush" in ablate:
            flush = jnp.bool_(False)
        elif "when" not in ablate:
            flush = jnp.bool_(True)
            do_flush()
        else:
            pl.when(flush)(do_flush)

        # ---- pend bookkeeping (pure control math). ---------------------
        pend1 = jnp.where(flush, -1, pendA)
        pendB1 = jnp.where(flush, -1, pendB)
        take = (leafbit * live) > 0
        pend_new = jnp.where(take & (pend1 < 0), cur & LEAF_MASK, pend1)

        # ---- internal step. --------------------------------------------
        t_best = t_ref[...]
        if any_hit:
            blocked = tri_ref[...]
            lane_act = (act > 0) & (_bc(done) == 0) & (blocked == 0)
        else:
            lane_act = (act > 0) & (_bc(done) == 0)
        is_node = live * (1 - leafbit) * (1 - retire)
        # Fetch addresses: computed VECTORIALLY first so each row costs
        # exactly ONE vector->scalar extract (three per row — leafbit,
        # done, cur — measured as the per-row scaling cost that kept
        # sub=16/32 from amortizing, experiments/sub_ab.py).
        fidx = jnp.where((leafbit > 0) | (done > 0), 0,
                         jnp.minimum(cur, END))  # (sub,1)
        fetch_idx = [fidx[s, 0] for s in range(sub)]
        if "mainfetch" in ablate:  # census: traced-but-always-0 addresses
            fetch_idx = [jnp.minimum(cur[s, 0] * 0, END)
                         for s in range(sub)]
        rs = jnp.concatenate(
            [rows_ref[pl.ds(fetch_idx[s], 1), :] for s in range(sub)],
            axis=0)  # (8,128)
        if "main2x" in ablate:  # census: duplicate traversal fetches
            rs2 = jnp.concatenate(
                [rows_ref[pl.ds(fetch_idx[s], 1), :] for s in range(sub)],
                axis=0)
            # Bit-exact no-op fold (int-space min; float min would
            # canonicalize the NaN bit patterns of bitcast -1 pointers).
            # CAVEAT: identical address expressions — the compiler may CSE
            # the loads, making this measure ~nothing; see fetchx2b.
            rs = lax.bitcast_convert_type(
                jnp.minimum(lax.bitcast_convert_type(rs, jnp.int32),
                            lax.bitcast_convert_type(rs2, jnp.int32)),
                jnp.float32)
        if "fetchx2b" in ablate:  # census: un-CSE-able fetch duplication
            # Different addresses (fidx+1), folded away by a runtime-false
            # unprovable mask — results exact, loads must actually issue.
            rs2 = jnp.concatenate(
                [rows_ref[pl.ds(jnp.minimum(fidx[s, 0] + 1, END), 1), :]
                 for s in range(sub)], axis=0)
            rs = jnp.where(_bc((fidx < 0).astype(jnp.int32)) > 0, rs2, rs)
        if width > WIDTH:
            # 16-ary second row (children 8-15). Address is fidx + 1 —
            # derived, not reduced, so the extra fetch rides the same
            # dependency chain position as the first.
            rs_b = jnp.concatenate(
                [rows_ref[pl.ds(fetch_idx[s] + 1, 1), :]
                 for s in range(sub)], axis=0)

        node_lane = lane_act & (_bc(is_node) > 0)
        # The per-child hit test is a cross-lane reduce — the deepest
        # non-fetch link of the step chain. Default ("packed"): each
        # child's lane-hit mask contributes a disjoint 8-bit count field
        # (<=128 lanes fits 8 bits) and groups of 4 children share ONE
        # lane sum-reduce — width/4 reduces total instead of width
        # independent min-reduces (which the VPU issues serially even
        # though they are data-parallel). The per-child min-tnear is only
        # needed by the "pairwise" A/B order (default order is the
        # hoisted octant priority). ablate="minred" restores the per-child
        # min-reduce for A/B.
        packed = ("pairwise" not in ablate and "minred" not in ablate)
        hits, tmins, ptrs, rhits = [], [], [], []
        for ci in range(width):
            src = rs if ci < WIDTH else rs_b
            b = 16 * (ci % WIDTH)
            bminx, bminy, bminz = (_bc(src[:, b + i:b + i + 1])
                                   for i in range(3))
            bmaxx, bmaxy, bmaxz = (_bc(src[:, b + i:b + i + 1])
                                   for i in range(3, 6))
            cptr = lax.bitcast_convert_type(src[:, b + 6:b + 7], jnp.int32)

            if "box" in ablate:
                tn = (bminx - ox) * ix
                tf = (bmaxx - ox) * ix + bminy + bmaxy + bminz + bmaxz \
                    + iy * 0 + iz * 0
            else:
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
            pr = t_best if not any_hit else t0
            rhit = (tf >= jnp.maximum(tn, 0.0)) & (tn < pr) & node_lane
            ptrs.append(cptr)
            if packed:
                rhits.append(rhit)
                continue
            # One reduce per child: the min-tnear doubles as the hit test.
            ctmin = jnp.min(jnp.where(rhit, tn, BIG), axis=1, keepdims=True)
            chit = ((ctmin < BIG) & (cptr != -1)).astype(jnp.int32)  # (8,1)
            hits.append(chit)
            tmins.append(ctmin)
        if packed:
            for g in range(0, width, 4):
                fields = _tree(jnp.add, [
                    rhits[g + j].astype(jnp.int32) << (8 * j)
                    for j in range(min(4, width - g))])  # (8,128)
                cnt = _rowsum(fields)  # (8,1): 4 disjoint lane counts
                for j in range(min(4, width - g)):
                    hits.append((((cnt >> (8 * j)) & 255) > 0)
                                .astype(jnp.int32)
                                * (ptrs[g + j] != -1).astype(jnp.int32))
        H = jnp.concatenate(hits, axis=1)  # (8,8) i32
        P = jnp.concatenate(ptrs, axis=1)  # (8,8) i32
        TN = jnp.concatenate(tmins, axis=1) if "pairwise" in ablate else None

        def _bw(col):  # (8,1) -> (8,width)
            return jax.lax.broadcast_in_dim(col, (sub, width), (0, 1))

        # Split hit children into internal and leaf sets (the tag bit lives
        # in the child pointer — no fetch needed to know a child's kind).
        leafc = ((P >> 30) & 1) * H  # (8,WIDTH) hit leaf children
        HI = H * (1 - ((P >> 30) & 1))  # hit internal children
        n_int = _rowsum(HI)  # (8,1)
        descend = (n_int > 0).astype(jnp.int32) * is_node  # (8,1)

        # ONE dense rank over all hit children (distinct per hit child:
        # prio is a per-row bijection); the leaf-enqueue pick, descend
        # target, and push positions all derive from it. Closest-hit uses
        # the hoisted octant-priority masks (near-to-far approx order);
        # shadow (any-hit) needs no ordering: index-order ranks via a
        # prefix sum.
        terms = []
        for cp in range(width):
            if "pairwise" in ablate and not any_hit:
                # Round-2 exact ordered descent (A/B reference): pairwise
                # union-tnear comparisons, ties broken by index.
                tn_cp = TN[:, cp:cp + 1]
                nearer = ((_bw(tn_cp) < TN)
                          | ((_bw(tn_cp) == TN) & (cp < c_iota)))
                terms.append((nearer & (_bw(H[:, cp:cp + 1]) > 0)
                              ).astype(jnp.int32))
                continue
            if any_hit or "rank" in ablate:
                if cp:
                    terms.append((c_iota >= cp).astype(jnp.int32)
                                 * _bw(H[:, cp - 1:cp]))
                continue
            terms.append((prio_lt[cp]
                          & (_bw(H[:, cp:cp + 1]) > 0)).astype(jnp.int32))
        rank_all = (_tree(jnp.add, terms) if terms
                    else jnp.zeros((sub, width), jnp.int32))

        # Nearest hit LEAF child goes straight into the free pend slot
        # (skipping the stack and its one-step-per-leaf parking cost).
        minL = jnp.min(jnp.where(leafc > 0, rank_all, width), axis=1,
                       keepdims=True)  # (8,1)
        selL0 = leafc * (rank_all == _bw(minL)).astype(jnp.int32)
        enq = ((_rowsum(leafc) > 0) & (pend_new < 0)
               & (is_node > 0)).astype(jnp.int32)  # (8,1)
        enq_ptr = _rowsum(selL0 * P) & LEAF_MASK
        pend_new = jnp.where(enq > 0, enq_ptr, pend_new)

        drain = "when" not in ablate and "drain" not in ablate
        if drain:
            # Second-nearest hit leaf child parks in slot B, and the
            # descend target is the nearest REMAINING child of ANY kind
            # (a leaf target takes the leafbit path next step). With all
            # children consumed by park/descend/push, rows on the pop
            # path provably pushed nothing this step — so the pop/drain
            # reads index the OLD stack carry, taking the whole
            # push-scatter chain off the step's critical path.
            leafc2 = leafc * (1 - selL0 * _bw(enq))
            minL2 = jnp.min(jnp.where(leafc2 > 0, rank_all, width),
                            axis=1, keepdims=True)
            selL1 = leafc2 * (rank_all == _bw(minL2)).astype(jnp.int32)
            enqB = ((_rowsum(leafc2) > 0) & (pendB1 < 0)
                    & (is_node > 0)).astype(jnp.int32)
            pendB_mid = jnp.where(enqB > 0,
                                  _rowsum(selL1 * P) & LEAF_MASK, pendB1)
            remaining = (H - selL0 * _bw(enq) - selL1 * _bw(enqB))
            minI = jnp.min(jnp.where(remaining > 0, rank_all, width),
                           axis=1, keepdims=True)
            sel0 = remaining * (rank_all == _bw(minI)).astype(jnp.int32)
            descend = (_rowsum(remaining) > 0).astype(jnp.int32) * is_node
            near_ptr = _rowsum(sel0 * P)  # may carry the leaf tag
        else:
            selL1 = jnp.zeros_like(leafc)
            enqB = jnp.zeros((sub, 1), jnp.int32)
            pendB_mid = pendB1
            # Nearest hit INTERNAL child is the descend target.
            minI = jnp.min(jnp.where(HI > 0, rank_all, width), axis=1,
                           keepdims=True)  # (8,1)
            sel0 = HI * (rank_all == _bw(minI)).astype(jnp.int32)
            near_ptr = _rowsum(sel0 * P)  # (8,1)

        # Push set: all hit children except the descend target and the
        # enqueued leaves. Ranks within the push set come from rank_all
        # minus the (at most three) excluded nearer children; scatter
        # far-to-near in one batched one-hot write.
        pushable = (H - sel0 * _bw(descend)
                    - selL0 * _bw(enq) - selL1 * _bw(enqB))  # (8,WIDTH)
        pushable = pushable * _bw(is_node)
        rank = (rank_all
                - (_bw(descend * minI) < rank_all).astype(jnp.int32)
                * _bw(descend)
                - (_bw(enq * minL + (1 - enq) * width) < rank_all
                   ).astype(jnp.int32))
        if drain:
            rank = rank - (_bw(enqB * minL2 + (1 - enqB) * width)
                           < rank_all).astype(jnp.int32)
        npush = _rowsum(pushable)
        push_c = pushable
        pos_c = _bw(ptr) + _bw(npush) - 1 - rank  # (8,WIDTH)
        deltas, writtens = [], []
        for ci in range(width if "stack" not in ablate else 0):
            onehot = ((lane_s == jax.lax.broadcast_in_dim(
                pos_c[:, ci:ci + 1], (sub, stack_size), (0, 1)))
                & (jax.lax.broadcast_in_dim(
                    push_c[:, ci:ci + 1], (sub, stack_size), (0, 1)) > 0)
            ).astype(jnp.int32)
            deltas.append(onehot * jax.lax.broadcast_in_dim(
                P[:, ci:ci + 1], (sub, stack_size), (0, 1)))
            writtens.append(onehot)
        zero = jnp.zeros((sub, stack_size), jnp.int32)
        delta = _tree(jnp.add, deltas) if deltas else zero
        written = _tree(jnp.add, writtens) if writtens else zero
        new_stack = stack * (1 - written) + delta
        pos = ptr + npush

        # Pop path (parked-leaf rows and no-hit internal rows), with LEAF
        # DRAINING: leaf-tagged stack tops park straight into free pend
        # slots (up to 2/step) and the row pops deeper in the same step —
        # a leaf visit then costs no step of its own. Only meaningful
        # with the branchless flush (slots are empty at every step's
        # parking phase); the sim puts leaf visits at ~45% of all steps.
        if drain:
            # Rows on the pop path pushed nothing this step (any remaining
            # child became the descend target), so the tops index the OLD
            # stack carry — available before the box test even starts,
            # keeping the push scatter off the critical path.
            def read_old(off):  # stack value at ptr-1-off, (sub,1)
                idx = jax.lax.broadcast_in_dim(
                    jnp.maximum(ptr - 1 - off, 0), (sub, stack_size),
                    (0, 1))
                return _rowsum(jnp.where(lane_s == idx, stack, 0))

            top0 = read_old(0)
            top1 = read_old(1)
            top2 = read_old(2)
            popg = (1 - descend) * live  # rows on the pop path
            freeA = (pend_new < 0).astype(jnp.int32)
            freeB = (pendB_mid < 0).astype(jnp.int32)
            cap = freeA + freeB
            t0l = ((top0 >> 30) & 1) * (ptr >= 1).astype(jnp.int32)
            t1l = ((top1 >> 30) & 1) * (ptr >= 2).astype(jnp.int32)
            take0 = popg * t0l * (cap >= 1).astype(jnp.int32)
            take1 = take0 * t1l * (cap >= 2).astype(jnp.int32)
            # First parked leaf -> slot A if free else slot B; second
            # (only possible when both were free) -> slot B.
            pend_new = jnp.where((take0 * freeA) > 0, top0 & LEAF_MASK,
                                 pend_new)
            pendB_new = jnp.where((take0 * (1 - freeA) * freeB) > 0,
                                  top0 & LEAF_MASK,
                                  jnp.where(take1 > 0, top1 & LEAF_MASK,
                                            pendB_mid))
            consumed = take0 + take1
            popped = jnp.where(consumed == 0, top0,
                               jnp.where(consumed == 1, top1, top2))
            can_pop = (ptr - consumed > 0).astype(jnp.int32)
            nxt = jnp.where(descend > 0, near_ptr,
                            jnp.where(can_pop > 0, popped, END))
            new_ptr = jnp.where(descend > 0, pos,
                                jnp.maximum(ptr - consumed - 1, 0))
        else:
            top_i = jax.lax.broadcast_in_dim(
                jnp.maximum(pos - 1, 0), (sub, stack_size), (0, 1))
            top0 = _rowsum(jnp.where(lane_s == top_i, new_stack, 0))
            pendB_new = pendB_mid
            can_pop = (pos > 0).astype(jnp.int32)
            nxt = jnp.where(descend > 0, near_ptr,
                            jnp.where(can_pop > 0, top0, END))
            new_ptr = jnp.where(descend > 0, pos, jnp.maximum(pos - 1, 0))

        retiring = ((nxt & LEAF_MASK) >= END)  # (8,1) bool
        pends_clear = (pend_new < 0) & (pendB_new < 0)
        fin = (done > 0) | (retiring & pends_clear)
        if any_hit:
            n_blocked = _rowsum(jnp.maximum(tri_ref[...], 1 - act))
            fin = fin | ((n_blocked >= SUBP) & pends_clear)
        fin = fin.astype(jnp.int32)
        # Rows retiring with a parked leaf wait on the inert END row until
        # the flush clears them.
        park = jnp.where(retiring, END, nxt)
        new_cur = (1 - fin) * park

        return (new_cur, new_ptr, fin, new_stack, pend_new, pendB_new)

    def cond(carry):
        steps, st = carry
        return jnp.logical_and(jnp.sum(st[2]) < sub, steps < max_steps)

    if "unroll1" in ablate:  # A/B: one step per cond evaluation
        unroll = 1
    elif "unroll4" in ablate:  # A/B: four steps per cond evaluation
        unroll = 4
    else:  # default: 2 steps per cond evaluation (best_config.py)
        unroll = 2

    def body(carry):
        steps, st = carry
        for _ in range(unroll):
            st = advance(st)
        return steps + unroll, st

    lax.while_loop(cond, body, (jnp.int32(0), init))


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "end_index", "interpret",
                                    "leaf_cap", "stack_size", "max_steps",
                                    "flush_fill", "ablate", "width",
                                    "leaf_rows"))
def _wide_trace(trav_rows, ox, oy, oz, dx, dy, dz, t0, act,
                *, any_hit: bool, end_index: int, max_steps: int,
                interpret: bool = False, leaf_cap: int = LEAF_CAP,
                stack_size: int = 64, flush_fill: int = 6,
                ablate: str = "", width: int = WIDTH,
                leaf_rows: int = 1):
    G, sub = ox.shape[0], ox.shape[1]
    kernel = functools.partial(_wide_kernel, end_index=end_index,
                               any_hit=any_hit, leaf_cap=leaf_cap,
                               max_steps=max_steps, stack_size=stack_size,
                               flush_fill=flush_fill, ablate=ablate,
                               width=width, leaf_rows=leaf_rows)
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # trav_rows (whole)
        ] + [pl.BlockSpec((1, sub, SUBP), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec((1, sub, SUBP), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, sub, SUBP), jnp.float32),
        jax.ShapeDtypeStruct((G, sub, SUBP), jnp.int32),
    ]
    t, tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(trav_rows, ox, oy, oz, dx, dy, dz, t0, act)
    return t, tri


def intersect_wide(scene, ro, rd, tmax=None, active=None,
                   any_hit: bool = False, interpret: bool = False,
                   sub: int | None = None) -> Hit:
    """Hit-compatible wrapper over the wide-BVH traversal kernel.

    Requires ``scene.trav_rows`` (built by accel/wide.py via
    scene/buffers.py). The kernel tracks only (t, tri); barycentrics for
    the winning triangle are recomputed once outside (recompute_uv), which
    drops two output buffers and two select chains per unrolled triangle.

    ``sub``: sub-packet rows per grid cell (default LOUPIOTE_WIDE_SUB or
    8). Larger values amortize the fixed per-step loop overhead over more
    rays; the ray count is padded up to a multiple of sub*128 with
    inactive lanes.
    """
    import os as _os

    if sub is None:
        sub = int(_os.environ.get("LOUPIOTE_WIDE_SUB", DEFAULT_SUB))
    ablate = ""
    if _os.environ.get("LOUPIOTE_NO_DRAIN") == "1":
        # Kill-switch for the leaf-draining pop scheme (host-replay and
        # interpret-verified; this guards against a Mosaic-only lowering
        # surprise on hardware the tunnel outage kept us from testing).
        ablate = "drain"
    R0 = ro.shape[0]
    tile = sub * SUBP
    R = -(-R0 // tile) * tile
    G = R // tile

    t0 = jnp.full(R0, T_FAR, jnp.float32) if tmax is None else tmax
    act = (jnp.ones(R0, jnp.int32) if active is None
           else active.astype(jnp.int32))
    if R != R0:
        pad = R - R0
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        rd = jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)])
        t0 = jnp.concatenate([t0, jnp.zeros(pad, t0.dtype)])
        act = jnp.concatenate([act, jnp.zeros(pad, act.dtype)])

    def shape(x):
        return x.reshape(G, sub, SUBP)

    t, tri = _wide_trace(
        scene.trav_rows,
        shape(ro[:, 0]), shape(ro[:, 1]), shape(ro[:, 2]),
        shape(rd[:, 0]), shape(rd[:, 1]), shape(rd[:, 2]),
        shape(t0), shape(act),
        any_hit=any_hit, end_index=int(scene.wide_end),
        max_steps=4 * int(scene.wide_end) + 64,
        interpret=interpret,
        leaf_cap=int(getattr(scene, "leaf_cap", LEAF_CAP)),
        stack_size=int(scene.wide_stack), ablate=ablate,
        width=int(getattr(scene, "wide_width", WIDTH)),
        leaf_rows=int(getattr(scene, "wide_leaf_rows", 1)))

    tri = tri.reshape(R)[:R0]
    if any_hit:
        tri = jnp.where(tri > 0, tri, -1)  # blocked flag -> hit/miss tri
        u = v = jnp.zeros(R0, jnp.float32)
    else:
        from .intersect import recompute_uv

        u, v = recompute_uv(scene, ro[:R0], rd[:R0], tri)
    if active is not None:
        tri = jnp.where(active, tri, -1)
    return Hit(t.reshape(R)[:R0], tri, u, v)


def occluded_wide(scene, ro, rd, tmax, active=None,
                  interpret: bool = False) -> jnp.ndarray:
    """(R,) bool: segment [T_MIN, tmax) blocked — wide any-hit variant.

    A dedicated shadow kernel (blocked-bit state, division-free sign-folded
    leaf test, boolean child reduce) was built and A/B-measured in round 3:
    it ran ~6x SLOWER than this generic kernel in any-hit mode on the
    arch-260k shadow wave (interleaved runs, experiments/shadow_bench.py)
    despite strictly fewer vector ops per step — removed; see ROADMAP.
    """
    hit = intersect_wide(scene, ro, rd, tmax=tmax, active=active,
                         any_hit=True, interpret=interpret)
    out = hit.tri > 0
    if active is not None:
        out = out & active
    return out
