"""Per-lane top-tree traversal: phase 1 of the treelet pipeline (round-3
performance centerpiece; primitive validated at 0.18 ns/ray-visit,
experiments/lane_gather_bench.py — ~30x the sub-packet kernel's effective
per-visit cost).

Every lane (ray) independently walks the BVH2 structure of the TOP of the
tree — the fine structure inside the first ``top_wide`` wide clusters
(accel/wide.py) — held as (8,128) VMEM gather tiles. When a lane's hit
target leaves the top region (a deeper wide cluster or a leaf row), the
target's unified-table row id is appended to the lane's pending list and
the walk continues at the miss link. Phase 2 (future) feeds the pending
lists to the sub-packet wide kernel with in-cell binning; today this module
is a tested, measured building block.

Table layout (``TopTables``): 8 per-node scalar fields, each an
(ceil(K/128), 8, 128)-tiled f32/i32 array (K = top-node count):
  minx,miny,minz,maxx,maxy,maxz : node bounds
  link : int32, hit_id | miss_id << 12  (ids into the top table; 0xFFF =
         out-of-top hit / END miss)
  pend : int32 unified-table row id to enqueue when the hit target leaves
         the top region (-1 when the hit target stays in-top)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, SUBP = 8, 128
TILE = SUB * SUBP
ID_BITS = 12
ID_MASK = (1 << ID_BITS) - 1  # also the out-of-top / END sentinel
PEND_CAP = 8  # pending slots per lane


@dataclass
class TopTables:
    fields: np.ndarray  # (8, T, 8, 128) float32 (ints bitcast), T tiles
    num_top: int
    tiles: int


def build_top_tables(bvh, top_wide: int | None = None) -> TopTables:
    """Thread the BVH2 fine structure of the first ``top_wide`` wide
    clusters (pre-order ids = a connected top region) for per-lane
    stackless walking.

    Two entry kinds share one table:
      - IN-TOP internal node: hit -> left child's entry, miss -> skip link.
      - FRONTIER node (a leaf or a deeper cluster root referenced by an
        in-top hit/miss link): its REAL box; on hit the unified-table row
        id is enqueued (``pend``), then the walk continues at its miss
        link either way — exactly the ordered threaded traversal with the
        subtree's work deferred to phase 2.
    """
    from loupiote_tpu.accel.wide import LEAF_TAG, collapse_wide_maps

    count = bvh.count
    is_leaf = count > 0
    N = bvh.num_nodes
    wide_of, leaf_row_of, W = collapse_wide_maps(bvh)
    if top_wide is None:
        top_wide = max(1, min(W, 1 << (ID_BITS - 4)))

    # BVH2 nodes inside top clusters (interior expansion nodes included;
    # frontier members — leaves and deeper cluster roots — excluded).
    in_top = np.zeros(N, bool)
    for n2, w in wide_of.items():
        if w >= top_wide:
            continue
        stack = [n2]
        while stack:
            m = stack.pop()
            if m != n2 and (is_leaf[m] or m in leaf_row_of
                            or (m in wide_of and wide_of[m] != w)):
                continue
            if in_top[m]:
                continue
            in_top[m] = True
            if not is_leaf[m]:
                stack.append(m + 1)
                stack.append(int(bvh.right[m]))

    top_ids = [int(i) for i in np.nonzero(in_top)[0]]
    # Frontier: every out-of-top node referenced by an in-top hit or miss
    # link (always a leaf or a cluster root — right children of in-top
    # nodes; see ROADMAP notes).
    frontier: list[int] = []
    seen = set(top_ids)

    def ref(t: int):
        if t < N and t not in seen:
            seen.add(t)
            frontier.append(t)

    if not top_ids:
        frontier.append(0)  # tiny scene: the root itself is the frontier
        seen.add(0)
    for n2 in top_ids:
        ref(n2 + 1)
        ref(int(bvh.miss[n2]))
    i = 0
    while i < len(frontier):  # frontier miss targets, to closure
        ref(int(bvh.miss[frontier[i]]))
        i += 1

    order = top_ids + frontier
    K = len(order)
    assert K < ID_MASK, f"top region too large: {K}"
    remap = {n: i for i, n in enumerate(order)}

    def rid(t: int) -> int:
        return remap.get(t, ID_MASK) if t < N else ID_MASK

    def row_of(n2: int) -> int:
        # Merged-leaf roots (DP collapse) may be internal BVH2 nodes.
        if n2 in leaf_row_of:
            return (W + leaf_row_of[n2]) | LEAF_TAG
        return wide_of[n2]

    minx = np.empty(K, np.float32)
    miny = np.empty(K, np.float32)
    minz = np.empty(K, np.float32)
    maxx = np.empty(K, np.float32)
    maxy = np.empty(K, np.float32)
    maxz = np.empty(K, np.float32)
    link = np.zeros(K, np.int32)
    pend = np.full(K, -1, np.int32)

    for i, n2 in enumerate(order):
        minx[i], miny[i], minz[i] = bvh.node_min[n2]
        maxx[i], maxy[i], maxz[i] = bvh.node_max[n2]
        miss_id = rid(int(bvh.miss[n2]))
        if in_top[n2]:
            hit_id = rid(n2 + 1)
            assert hit_id != ID_MASK, "in-top child must be in table"
        else:  # frontier
            hit_id = ID_MASK
            pend[i] = row_of(n2)
        link[i] = np.int32(hit_id | (miss_id << ID_BITS))

    T = max(1, -(-K // TILE))
    fields = np.zeros((8, T * TILE), np.float32)
    for fi, arr in enumerate((minx, miny, minz, maxx, maxy, maxz)):
        fields[fi, :K] = arr
        fields[fi, K:] = 1e30 if fi < 3 else -1e30
    fields[6, :K] = link.view(np.float32)
    fields[6, K:] = np.int32(ID_MASK | (ID_MASK << ID_BITS)).view(np.float32)
    fields[7, :K] = pend.view(np.float32)
    fields[7, K:] = np.int32(-1).view(np.float32)
    return TopTables(fields=fields.reshape(8, T, SUB, SUBP),
                     num_top=K, tiles=T)


def _gather(tab_tiles, idx, tiles):
    """Per-lane gather of idx (8,128) from tab_tiles (T,8,128)."""
    tile = idx >> 10  # 1024 entries per tile
    within = idx & 1023
    row = within >> 7
    lane = within & 127
    out = jnp.zeros((SUB, SUBP), jnp.float32)
    for t in range(tiles):
        for s in range(SUB):
            row_b = lax.broadcast_in_dim(tab_tiles[t, s:s + 1, :],
                                         (SUB, SUBP), (0, 1))
            g = jnp.take_along_axis(row_b, lane, axis=1)
            out = jnp.where((row == s) & (tile == t), g, out)
    return out


def _lane_top_kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                     dz_ref, t0_ref, act_ref, pend_out, npend_out,
                     *, tiles: int, max_steps: int):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0]
    t0 = t0_ref[0]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    END = jnp.int32(ID_MASK)

    for p in range(PEND_CAP):
        pend_out[0, p] = jnp.full((SUB, SUBP), -1, jnp.int32)
    npend_out[0] = jnp.zeros((SUB, SUBP), jnp.int32)

    def cond(c):
        cur, steps = c[0], c[-1]
        return jnp.logical_and(jnp.any(cur != END), steps < max_steps)

    def body(c):
        (cur, np_, steps) = c
        safe = jnp.where(cur == END, 0, cur)
        bminx = _gather(tab_ref[0], safe, tiles)
        bminy = _gather(tab_ref[1], safe, tiles)
        bminz = _gather(tab_ref[2], safe, tiles)
        bmaxx = _gather(tab_ref[3], safe, tiles)
        bmaxy = _gather(tab_ref[4], safe, tiles)
        bmaxz = _gather(tab_ref[5], safe, tiles)
        link = lax.bitcast_convert_type(_gather(tab_ref[6], safe, tiles),
                                        jnp.int32)
        pend = lax.bitcast_convert_type(_gather(tab_ref[7], safe, tiles),
                                        jnp.int32)

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
        live = (cur != END) & (act > 0)
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t0) & live

        hit_id = link & ID_MASK
        miss_id = (link >> ID_BITS) & ID_MASK
        # Enqueue when the hit target leaves the top region.
        enq = hit & (pend >= 0) & (np_ < PEND_CAP)
        for p in range(PEND_CAP):
            sel = enq & (np_ == p)
            pend_out[0, p] = jnp.where(sel, pend, pend_out[0, p])
        np2 = np_ + enq.astype(jnp.int32)
        descend = hit & (hit_id != ID_MASK)
        nxt = jnp.where(descend, hit_id, miss_id)
        nxt = jnp.where(live, nxt, END)
        # Overflow: a lane that hits a frontier box with all PEND_CAP slots
        # full parks at END with its walk INCOMPLETE — pendings past the cap
        # are dropped. Consumers must treat npend == PEND_CAP as "incomplete
        # lane" and re-trace it with the full kernel (see lane_top_trace).
        nxt = jnp.where(hit & (pend >= 0) & (np_ >= PEND_CAP), END, nxt)
        return (nxt, np2, steps + 1)

    cur0 = jnp.zeros((SUB, SUBP), jnp.int32)
    cur0 = jnp.where(act > 0, cur0, END)
    out = lax.while_loop(cond, body,
                         (cur0, jnp.zeros((SUB, SUBP), jnp.int32),
                          jnp.int32(0)))
    npend_out[0] = out[1]


@functools.partial(jax.jit, static_argnames=("tiles", "num_top",
                                             "interpret"))
def _lane_top_trace(tab, ox, oy, oz, dx, dy, dz, t0, act, *, tiles: int,
                    num_top: int, interpret: bool = False):
    G = ox.shape[0]
    kernel = functools.partial(_lane_top_kernel, tiles=tiles,
                               max_steps=4 * num_top + 64)
    pend, npend = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec((1, PEND_CAP, SUB, SUBP),
                                lambda g: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((G, PEND_CAP, SUB, SUBP), jnp.int32),
                   jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tab, ox, oy, oz, dx, dy, dz, t0, act)
    return pend, npend


def lane_top_trace(tables: TopTables, ro, rd, tmax=None, active=None,
                   interpret: bool = False):
    """Phase-1 per-lane walk. Returns (pend (R, PEND_CAP) int32 row ids,
    npend (R,) int32). Pending entries carry accel.wide.LEAF_TAG for leaf
    rows, matching the unified-table convention.

    A lane with npend == PEND_CAP may be INCOMPLETE (its walk parked when
    the cap was reached and further pendings were dropped); phase-2
    consumers must fall back to the full traversal kernel for such lanes.
    """
    R = ro.shape[0]
    assert R % TILE == 0
    G = R // TILE

    def shape(x):
        return x.reshape(G, SUB, SUBP)

    t0 = (jnp.full(R, 3e30, jnp.float32) if tmax is None else tmax)
    act = (jnp.ones(R, jnp.int32) if active is None
           else active.astype(jnp.int32))
    pend, npend = _lane_top_trace(
        jnp.asarray(tables.fields),
        shape(ro[:, 0]), shape(ro[:, 1]), shape(ro[:, 2]),
        shape(rd[:, 0]), shape(rd[:, 1]), shape(rd[:, 2]),
        shape(t0), shape(act),
        tiles=tables.tiles, num_top=tables.num_top, interpret=interpret)
    return (jnp.moveaxis(pend, 1, 3).reshape(R, PEND_CAP),
            npend.reshape(R))
