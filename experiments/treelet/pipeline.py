"""Two-phase per-lane traversal pipeline (round-3 performance centerpiece).

  phase 1  ops/lane_top.py     per-lane walk of the threaded TOP region;
                               every lane collects the subtree ids whose
                               root boxes its ray enters (<= PEND_CAP).
  binning  (this module, XLA)  pairs (ray, subtree) are sorted by subtree
                               (lax.sort), ranked within their run, and
                               scattered into 1024-pair blocks padded per
                               subtree, so each phase-2 block is single-
                               subtree.
  phase 2  ops/lane_bottom.py  per-lane threaded walk of each subtree
                               (nodes AND triangles), 1 gather tile per
                               field selected by scalar prefetch.
  combine  (XLA)               per-ray min over its pairs; lanes whose
                               pend list overflowed fall back to the wide
                               sub-packet kernel with an active mask.

Why: the wide kernel is VPU-bound at ~1.2us/step with ~13x sub-packet
union redundancy on diffuse waves (ROADMAP); per-lane traversal only pays
for entries the ray itself enters.

Reference behavior: IntersectorPass + shadow-ray occlusion contract
(`/root/reference/crates/lib/src/renderer.rs:453-510`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .build import SUB_END, build_treelets
from loupiote_tpu.ops.intersect import Hit, INVALID_TRI, T_FAR
from .lane_bottom import TILE, lane_bottom_trace
from .lane_top import PEND_CAP, TopTables, lane_top_trace

# Pair-budget factor: the padded pair array holds PAIR_BUDGET * R slots
# (mean pendings measured ~2.5 on arch-260k diffuse; rays whose pairs do
# not fit fall back to the wide kernel).
PAIR_BUDGET = 4


@struct.dataclass
class TreeletDevice:
    """Device-side treelet tables (hangs off SceneBuffers as an optional
    pytree leaf bundle)."""

    top_fields: jnp.ndarray  # (8, T, 8, 128) f32
    sub_fields: jnp.ndarray  # (NUM_FIELDS, S+1, 8, 128) f32 (tile S empty)
    sub_tri_base: jnp.ndarray  # (S+1,) int32
    num_top: int = struct.field(pytree_node=False, default=0)
    top_tiles: int = struct.field(pytree_node=False, default=1)
    num_subtrees: int = struct.field(pytree_node=False, default=0)


def build_treelet_device(bvh, tri9: np.ndarray) -> TreeletDevice:
    t = build_treelets(bvh, tri9)
    S = t.num_subtrees
    # Tile S: an all-empty dump subtree for padding blocks (boxes never
    # hit, links -> END).
    sub = np.concatenate([t.sub_fields,
                          _empty_tile_like(t.sub_fields)], axis=1)
    return TreeletDevice(
        top_fields=jnp.asarray(t.top_fields),
        sub_fields=jnp.asarray(sub),
        sub_tri_base=jnp.asarray(
            np.concatenate([t.sub_tri_base, np.zeros(1, np.int32)])),
        num_top=t.num_top,
        top_tiles=t.top_tiles,
        num_subtrees=S,
    )


def _empty_tile_like(sub_fields: np.ndarray) -> np.ndarray:
    F = sub_fields.shape[0]
    tile = np.zeros((F, 1) + sub_fields.shape[2:], np.float32)
    tile[0:3] = 1e30
    tile[3:6] = -1e30
    tile[9] = np.float32(np.int32(SUB_END | (SUB_END << 10))
                         .view(np.float32))
    tile[10] = np.float32(np.int32(-1).view(np.float32))
    return tile


@functools.partial(jax.jit,
                   static_argnames=("num_top", "top_tiles", "num_subtrees",
                                    "any_hit", "interpret", "regroup"))
def _treelet_core(top_fields, sub_fields, sub_tri_base, ro, rd, t0, act,
                  *, num_top: int, top_tiles: int, num_subtrees: int,
                  any_hit: bool, interpret: bool = False,
                  regroup: str = "xla"):
    """Full pipeline minus the fallback. Returns (t, tri, fallback_mask)."""
    R = ro.shape[0]
    S = num_subtrees

    # --- phase 1: per-lane top walk -> pend lists of subtree ids. --------
    tables = TopTables(fields=top_fields, num_top=num_top, tiles=top_tiles)
    pend, npend = lane_top_trace(tables, ro, rd, tmax=t0, active=act > 0,
                                 interpret=interpret)
    # pend: (R, PEND_CAP) int32 subtree ids (-1 empty). npend == PEND_CAP
    # may be an incomplete lane -> fallback.

    return _bin_and_walk(sub_fields, sub_tri_base, ro, rd, t0, act,
                         pend, npend, S=S, any_hit=any_hit,
                         interpret=interpret, regroup=regroup)


def _compact_pairs(pend, npend, act, *, S: int):
    """Binning stage A: compact (ray, subtree) pairs into a PAIR_BUDGET*R
    array via a per-ray cumsum (sorting the R*PEND_CAP slot grid directly
    would more than double the sort size — the sort is the glue's dominant
    cost). Returns (key, ray_of, fallback)."""
    R = pend.shape[0]
    P_pad = PAIR_BUDGET * R
    np_eff = jnp.where(act > 0, jnp.minimum(npend, PEND_CAP), 0)
    ray_base = jnp.cumsum(np_eff) - np_eff  # exclusive
    # Rays whose pairs don't fit the budget (or whose pend list overflowed
    # in phase 1) fall back to the wide kernel.
    fallback = ((ray_base + np_eff > P_pad) | (npend >= PEND_CAP)) & (act > 0)
    keep = (act > 0) & ~fallback

    slot = jnp.tile(jnp.arange(PEND_CAP, dtype=jnp.int32)[None, :], (R, 1))
    valid = (slot < np_eff[:, None]) & (pend >= 0) & keep[:, None]
    dest0 = jnp.where(valid, ray_base[:, None] + slot, P_pad)
    key = jnp.full(P_pad + 1, S, jnp.int32).at[dest0.reshape(-1)].set(
        jnp.where(valid, pend, S).reshape(-1))[:P_pad]
    ray_of = jnp.zeros(P_pad + 1, jnp.int32).at[dest0.reshape(-1)].set(
        jnp.repeat(jnp.arange(R, dtype=jnp.int32)[:, None], PEND_CAP,
                   axis=1).reshape(-1))[:P_pad]
    return key, ray_of, fallback


def _bin_and_walk(sub_fields, sub_tri_base, ro, rd, t0, act, pend, npend,
                  *, S: int, any_hit: bool, interpret: bool, regroup: str):
    """Binning + phase 2 (split out so experiments/treelet_split.py can jit
    the stages separately for the regroup-vs-walk attribution)."""
    R = ro.shape[0]
    P_pad = PAIR_BUDGET * R
    key, ray_of, fallback = _compact_pairs(pend, npend, act, S=S)
    if regroup == "count":
        # Counting-scatter regroup (ops/regroup.py): slab sort + DMA
        # scatter replaces the lax.sort + rank + padded-scatter glue
        # below. Capacity is static-sufficient (tile-aligned regions over
        # PAIR_BUDGET*R pairs), so no extra fallback arises here.
        from .regroup import block_regroup

        pair_ray, sid_blocks, pair_on = block_regroup(
            key, ray_of, S, tile=TILE, interpret=interpret)
        pair_sid = jnp.repeat(sid_blocks, TILE)
        return _phase2_combine(sub_fields, sub_tri_base, ro, rd, t0,
                               pair_ray, pair_sid, pair_on, sid_blocks,
                               fallback, any_hit=any_hit,
                               interpret=interpret)

    pair_ray, pair_sid, pair_on, fallback = _bin_pairs_xla(
        key, ray_of, fallback, R=R, S=S)
    return _phase2_combine(sub_fields, sub_tri_base, ro, rd, t0,
                           pair_ray, pair_sid, pair_on,
                           pair_sid[::TILE], fallback,
                           any_hit=any_hit, interpret=interpret)


def _bin_pairs_xla(key, ray_of, fallback, *, R: int, S: int):
    """Binning stage B (XLA backend): sort pairs by subtree, rank within
    runs, scatter into TILE-padded single-subtree blocks. Returns
    (pair_ray, pair_sid, pair_on, fallback)."""
    P_pad = PAIR_BUDGET * R
    # This lax.sort is the pipeline's dominant cost at wave scale
    # (~1.6 s best case at 8.4M pairs) and the reason the pipeline stays
    # opt-in. The Pallas bitonic sort (ops/device_sort.py) was built to
    # replace it and measured SLOWER (5.4 s same window) — see its header.
    key_s, ray_s = jax.lax.sort((key, ray_of), num_keys=1)

    # Rank within each contiguous key run (keys are sorted: one run per
    # subtree). rank = i - first_index_of_run(i), via a cummax.
    ar = jnp.arange(P_pad, dtype=jnp.int32)
    run_start = jnp.where(
        jnp.concatenate([jnp.ones(1, jnp.bool_), key_s[1:] != key_s[:-1]]),
        ar, 0)
    rank = ar - jax.lax.cummax(run_start)

    counts = jax.ops.segment_sum(jnp.ones(P_pad, jnp.int32), key_s,
                                 num_segments=S + 1)
    padded = -(-counts[:S] // TILE) * TILE
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(padded).astype(jnp.int32)])
    # Destination slot; dump-key pairs and pad overflow land at P_pad.
    dest = jnp.where(key_s < S, base[jnp.minimum(key_s, S - 1)] + rank,
                     P_pad)
    dest = jnp.minimum(dest, P_pad)
    # Padding can push the padded total past P_pad; affected rays fall
    # back (rare: budget has >= 35% headroom over the measured mean).
    over_pad = (dest >= P_pad) & (key_s < S)
    fallback = fallback | jnp.zeros(R, jnp.bool_).at[ray_s].max(over_pad)

    pair_ray = jnp.full(P_pad + 1, 0, jnp.int32).at[dest].set(ray_s)
    pair_sid = jnp.full(P_pad + 1, S, jnp.int32).at[dest].set(
        jnp.minimum(key_s, S))
    pair_on = jnp.zeros(P_pad + 1, jnp.int32).at[dest].set(
        (key_s < S).astype(jnp.int32))
    pair_ray = pair_ray[:P_pad]
    pair_sid = pair_sid[:P_pad]
    pair_on = pair_on[:P_pad]
    return pair_ray, pair_sid, pair_on, fallback


def _phase2_combine(sub_fields, sub_tri_base, ro, rd, t0, pair_ray,
                    pair_sid, pair_on, sid_blocks, fallback, *,
                    any_hit: bool, interpret: bool):
    """Per-lane subtree walks over single-subtree blocks, then the
    per-ray min over pairs (shared by both binning backends)."""
    R = ro.shape[0]
    pro = ro[pair_ray]
    prd = rd[pair_ray]
    pt0 = t0[pair_ray]
    pt, ptri_local = lane_bottom_trace(
        sid_blocks, sub_fields, pro, prd, pt0, pair_on,
        any_hit=any_hit, interpret=interpret)

    # --- combine: per-ray min over pairs. --------------------------------
    hit_ok = (ptri_local >= 0) & (pair_on > 0)
    pt = jnp.where(hit_ok, pt, T_FAR)
    tmin = jnp.full(R, T_FAR, jnp.float32).at[pair_ray].min(
        jnp.where(pair_on > 0, pt, T_FAR))
    ptri = jnp.where(hit_ok, sub_tri_base[pair_sid] + ptri_local,
                     INVALID_TRI)
    cand = hit_ok & (pt <= tmin[pair_ray])
    tri = jnp.full(R, INVALID_TRI, jnp.int32).at[pair_ray].max(
        jnp.where(cand, ptri, INVALID_TRI))
    t_out = jnp.where(tri >= 0, tmin, t0)
    return t_out, tri, fallback


def treelet_intersect(scene, ro, rd, tmax=None, active=None,
                      any_hit: bool = False,
                      interpret: bool = False) -> Hit:
    """Hit-compatible treelet-pipeline traversal with wide-kernel fallback
    for overflow lanes. Requires ``scene.treelet`` (a TreeletDevice)."""
    td: TreeletDevice = scene.treelet
    R = ro.shape[0]
    t0 = (jnp.full(R, T_FAR, jnp.float32) if tmax is None
          else tmax.astype(jnp.float32))
    act = (jnp.ones(R, jnp.int32) if active is None
           else active.astype(jnp.int32))

    import os as _os

    t, tri, fallback = _treelet_core(
        td.top_fields, td.sub_fields, td.sub_tri_base, ro, rd, t0, act,
        num_top=td.num_top, top_tiles=td.top_tiles,
        num_subtrees=td.num_subtrees, any_hit=any_hit, interpret=interpret,
        regroup=_os.environ.get("LOUPIOTE_REGROUP", "xla"))

    # Fallback lanes re-trace through the wide sub-packet kernel (exact
    # same tree); packets with no active lane retire on their first step.
    # Route through the SAME dispatch gates as the default path: on scenes
    # whose unified row table exceeds the wide kernel's VMEM ceiling,
    # _wide_enabled is False and the streaming BVH2 kernel must serve the
    # fallback too (round-3 advisor finding).
    from loupiote_tpu.ops.intersect import _wide_enabled, intersect_packets
    from loupiote_tpu.ops.pallas_wide import intersect_wide

    fb_act = fallback & (act > 0)
    if interpret or not _wide_enabled(scene):
        fb = intersect_packets(scene, ro, rd, tmax=t0, active=fb_act,
                               any_hit=any_hit)
    else:
        fb = intersect_wide(scene, ro, rd, tmax=t0, active=fb_act,
                            any_hit=any_hit)
    use_fb = fb_act
    t = jnp.where(use_fb, fb.t, t)
    tri = jnp.where(use_fb, fb.tri, tri)

    # u/v recomputed once for final hits (the pipeline tracks only t/tri).
    from loupiote_tpu.ops.intersect import recompute_uv

    u, v = recompute_uv(scene, ro, rd, tri)
    return Hit(t, tri, u, v)


def treelet_occluded(scene, ro, rd, dist, active=None,
                     interpret: bool = False) -> jnp.ndarray:
    tmax = dist * (1.0 - 1e-3)
    hit = treelet_intersect(scene, ro, rd, tmax=tmax, active=active,
                            any_hit=True, interpret=interpret)
    out = hit.tri != INVALID_TRI
    if active is not None:
        out = out & active
    return out
