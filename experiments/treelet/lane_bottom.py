"""Phase-2 per-lane subtree traversal (treelet pipeline bottom half).

Each grid block processes 1024 (ray, subtree) pairs that all target the
SAME subtree: the block's 10 field tiles (one (8, 128) tile per field,
accel/treelet.py layout) are selected by a scalar-prefetched subtree id,
and every lane independently walks the threaded subtree — node slab tests
and triangle tests alike — updating a per-lane best hit. This removes the
sub-packet union redundancy that bounds the wide kernel (~13x on diffuse
waves): a lane only ever touches entries its own ray enters.

Gather primitive: per-lane (8, 128) table lookups via a broadcast +
take_along_axis + select scan over the tile's 8 sublanes — measured at
~4-7 ns marginal per gather when pipelined (experiments/r3_probes.py
seggather), ~84 ns for a dependent chain.

Reference behavior: IntersectorPass contract
(`/root/reference/crates/lib/src/renderer.rs:453-464`); results must agree
exactly with the SIMT oracle on the same BVH.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .build import NUM_FIELDS, SUB_END
from loupiote_tpu.ops.intersect import T_MIN

SUB, SUBP = 8, 128
TILE = SUB * SUBP
BIG = 3e30


def _gather_tile(tab, row, lane):
    """Per-lane gather from one (8, 128) tile: out[s, l] = tab[row, lane].

    The per-sublane candidates are masked then TREE-folded (depth 3)
    instead of the original 8-deep serial where-chain: this walk is a
    lockstep while-loop whose step cost is dependency-chain latency (same
    cost model as ops/pallas_wide.py), so the select scan sat on the
    critical path of every step. The fold runs in INT space with bitwise
    OR — float adds would canonicalize NaN bit patterns, corrupting link
    fields whose bitcast int payloads land in the exponent bits."""
    cands = []
    for s in range(SUB):
        row_b = lax.broadcast_in_dim(tab[s:s + 1, :], (SUB, SUBP), (0, 1))
        g = lax.bitcast_convert_type(
            jnp.take_along_axis(row_b, lane, axis=1), jnp.int32)
        cands.append(jnp.where(row == s, g, 0))
    while len(cands) > 1:
        nxt = [cands[i] | cands[i + 1] for i in range(0, len(cands) - 1, 2)]
        if len(cands) % 2:
            nxt.append(cands[-1])
        cands = nxt
    return lax.bitcast_convert_type(cands[0], jnp.float32)


def _lane_bottom_kernel(sid_ref, f_ref, ox_ref, oy_ref, oz_ref,
                        dx_ref, dy_ref, dz_ref, t0_ref, act_ref,
                        t_out, tri_out,
                        *, max_steps: int, any_hit: bool):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0]
    t0 = t0_ref[0]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    END = jnp.int32(SUB_END)

    def body(c):
        (cur, best_t, best_tri, steps) = c
        safe = jnp.where(cur == END, 0, cur)
        row = safe >> 7
        lane = safe & 127
        g = [_gather_tile(f_ref[fi, 0], row, lane)
             for fi in range(NUM_FIELDS - 1)]
        link = lax.bitcast_convert_type(g[9], jnp.int32)
        hit_id = link & 1023
        miss_id = (link >> 10) & 1023
        is_tri = ((link >> 20) & 1) > 0
        local = (link >> 21) & 1023

        live = (cur != END) & (act > 0)

        # Node path: slab test on f0..f5 (garbage for tri entries, masked).
        t1x = (g[0] - ox) * ix
        t2x = (g[3] - ox) * ix
        t1y = (g[1] - oy) * iy
        t2y = (g[4] - oy) * iy
        t1z = (g[2] - oz) * iz
        t2z = (g[5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                     jnp.minimum(t1y, t2y)),
                         jnp.minimum(t1z, t2z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                     jnp.maximum(t1y, t2y)),
                         jnp.maximum(t1z, t2z))
        node_go = (~is_tri & live & (tf >= jnp.maximum(tn, 0.0))
                   & (tn < best_t))

        # Triangle path: Moller-Trumbore on f0..f8 = p0, e1, e2.
        pvx = dy * g[8] - dz * g[7]
        pvy = dz * g[6] - dx * g[8]
        pvz = dx * g[7] - dy * g[6]
        det = g[3] * pvx + g[4] * pvy + g[5] * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ox - g[0]
        tvy = oy - g[1]
        tvz = oz - g[2]
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * g[5] - tvz * g[4]
        qvy = tvz * g[3] - tvx * g[5]
        qvz = tvx * g[4] - tvy * g[3]
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (g[6] * qvx + g[7] * qvy + g[8] * qvz) * inv_det
        ok = (is_tri & live & (jnp.abs(det) > 1e-12)
              & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > T_MIN) & (tt < best_t))
        best_t = jnp.where(ok, tt, best_t)
        best_tri = jnp.where(ok, local, best_tri)

        nxt = jnp.where(node_go, hit_id, miss_id)
        nxt = jnp.where(live, nxt, END)
        if any_hit:
            nxt = jnp.where(ok, END, nxt)
        return (nxt, best_t, best_tri, steps + 1)

    def cond(c):
        return jnp.logical_and(jnp.any(c[0] != END), c[3] < max_steps)

    cur0 = jnp.where(act > 0, 0, SUB_END).astype(jnp.int32)
    out = lax.while_loop(
        cond, body,
        (cur0, t0, jnp.full((SUB, SUBP), -1, jnp.int32), jnp.int32(0)))
    t_out[0] = out[1]
    tri_out[0] = out[2]


@functools.partial(jax.jit, static_argnames=("max_steps", "any_hit",
                                             "interpret"))
def lane_bottom_trace(sid, sub_fields, ro, rd, t0, act, *,
                      max_steps: int = 2048, any_hit: bool = False,
                      interpret: bool = False):
    """Walk pairs against their subtrees.

    Args:
      sid: (G,) int32 subtree tile id per 1024-pair block.
      sub_fields: (NUM_FIELDS, S, 8, 128) float32 device tables.
      ro, rd: (G*1024, 3) pair-ordered ray data.
      t0: (G*1024,) per-pair upper bound.
      act: (G*1024,) int32 pair validity.
    Returns (t (P,), tri_local (P,)) — tri_local is the in-subtree ordinal
    (-1 = miss); add the subtree's base to get the global triangle id.
    """
    P = ro.shape[0]
    G = P // TILE
    assert P % TILE == 0

    def shape(x):
        return x.reshape(G, SUB, SUBP)

    kernel = functools.partial(_lane_bottom_kernel, max_steps=max_steps,
                               any_hit=any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((NUM_FIELDS - 1, 1, SUB, SUBP),
                         lambda g, sid_ref: (0, sid_ref[g], 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, SUB, SUBP), lambda g, sid_ref: (g, 0, 0),
                          memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec((1, SUB, SUBP),
                                lambda g, sid_ref: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )
    t, tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.float32),
                   jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(sid, sub_fields[:NUM_FIELDS - 1], shape(ro[:, 0]), shape(ro[:, 1]),
      shape(ro[:, 2]), shape(rd[:, 0]), shape(rd[:, 1]), shape(rd[:, 2]),
      shape(t0), shape(act))
    return t.reshape(P), tri.reshape(P)
