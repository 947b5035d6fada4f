"""Exact global group-by-key regroup: slab sort + counting-scatter DMA.

The treelet pipeline's boss fight (ROADMAP): regrouping ~8.4M
(subtree, ray) pairs by subtree so phase 2 can walk VMEM-resident
subtrees per-lane. Every measured alternative lost:
  - XLA sort/scatter/gather: ~160-285 ns/element (regroup alone costs
    more than the whole traversal wave).
  - Pallas global bitonic (ops/device_sort.py): ~650 ns/element — the
    cross-slab merge phases are full-array HBM roll traffic.
This module exploits what a counting sort CAN use on TPU: grid cells
execute sequentially, so per-cell DMA scatters into globally computed
bases are race-free by construction.

Pipeline (keys are small ints, K = n_keys distinct):
  1. ops/slab_sort.py: sort each 64k-element cell by key in ONE Pallas
     dispatch (VMEM-speed bitonic; payload rides the same select mask).
  2. XLA glue (cheap, small): per-cell per-key counts C[g,k] from a
     vmapped searchsorted on the sorted cells; global histogram
     H = sum_g C; per-key output regions sized H[k] + CHUNK (the +CHUNK
     gap absorbs DMA spill, below); per-(cell,key) destination bases by
     an exclusive scan over cells; compacted per-cell run lists.
  3. scatter_runs kernel: for each cell (sequential grid), DMA each of
     its key-runs from the sorted VMEM block to its global base in HBM,
     in CHUNK-element copies. The final chunk of a run may copy up to
     CHUNK-1 junk elements past the run's end ("spill"): the source
     block carries a CHUNK-row junk pad, and the spill lands either in
     a LATER cell's portion of the same key region (overwritten by that
     cell's own copy — cells execute in base order) or in the key
     region's +CHUNK tail gap (masked by counts). No element is ever
     masked, aligned, or re-copied: runs pack exactly.

Output: (Rp,) grouped payloads + per-key (start, count) — key k's
payloads sit at out[starts[k] : starts[k] + counts[k]], junk between
regions. The reference has no analog (its wavefront never regroups);
this is SURVEY.md §7's data-movement answer for per-lane traversal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loupiote_tpu.ops.slab_sort import slab_sort

CHUNK = 256  # DMA copy granule (elements); also the per-key gap size


def _scatter_kernel(nruns_ref, src_ref, dst_ref, len_ref, data_ref,
                    out_ref, *, chunk: int, max_wait: int = 1024):
    """One grid step = one source cell. Tables arrive as (1, 1, MAXR)
    SMEM blocks over (G, 1, MAXR) arrays — Mosaic's tiling check requires
    the last TWO block dims to equal the array dims (or be (8,128)-
    divisible), so the grid-blocked dim must be third-from-last; data as
    the cell's (1, 1, SP) VMEM block; out is the full (Rp,) array in ANY."""
    nr = nruns_ref[0, 0, 0]

    def body(sem):
        def run_loop(state):
            r, issued = state
            s = src_ref[0, 0, r]
            d = dst_ref[0, 0, r]
            ln = len_ref[0, 0, r]
            nch = (ln + chunk - 1) // chunk

            def chunk_loop(c, issued):
                pltpu.make_async_copy(
                    data_ref.at[pl.ds(s + c * chunk, chunk)],
                    out_ref.at[pl.ds(d + c * chunk, chunk)],
                    sem).start()
                return issued + 1

            issued = lax.fori_loop(0, nch, chunk_loop, issued)
            return r + 1, issued

        _, issued = lax.while_loop(lambda st: st[0] < nr, run_loop,
                                   (jnp.int32(0), jnp.int32(0)))

        def wait_loop(i, _):
            pltpu.make_async_copy(
                data_ref.at[pl.ds(0, chunk)],
                out_ref.at[pl.ds(0, chunk)], sem).wait()
            return 0

        # All of this cell's copies must land before the pipeline reuses
        # the VMEM block for the next cell.
        lax.fori_loop(0, issued, wait_loop, 0)

    pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))


@functools.partial(jax.jit,
                   static_argnames=("out_rows", "chunk", "interpret"))
def scatter_runs(data2, nruns, src, dst, lens, *, out_rows: int,
                 chunk: int = CHUNK, interpret: bool = False):
    """DMA-scatter per-cell runs of ``data2`` (G, SLAB + chunk) int32 to
    ``out`` (out_rows,) at per-run destinations. ``nruns`` (G,),
    ``src``/``dst``/``lens`` (G, MAXR) int32 (entries past nruns[g]
    ignored). Caller contract (see module docstring): run destinations
    ascend with g within any overlapping neighborhood and every run's
    dst + ceil(len/chunk)*chunk stays inside writable/junk space."""
    G, SP = data2.shape
    MAXR = src.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, MAXR), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, MAXR), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, MAXR), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, SP), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
    )

    def kern(nruns_ref, src_ref, dst_ref, len_ref, data_ref, out_ref):
        _scatter_kernel(nruns_ref, src_ref, dst_ref, len_ref,
                        data_ref.at[0, 0], out_ref, chunk=chunk)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows,), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(nruns.reshape(G, 1, 1), src.reshape(G, 1, MAXR),
      dst.reshape(G, 1, MAXR), lens.reshape(G, 1, MAXR),
      data2.reshape(G, 1, SP))


def counting_regroup(key: jnp.ndarray, payload: jnp.ndarray, n_keys: int,
                     slab_log: int = 16, chunk: int = CHUNK,
                     interpret: bool = False):
    """Group ``payload`` (R,) int32 by ``key`` (R,) int32 in [0, n_keys).

    Returns (out, starts, counts): key k's payload elements (original
    relative order NOT preserved — grouped, not stably sorted) live at
    ``out[starts[k] : starts[k] + counts[k]]``; other positions junk.
    """
    R = key.shape[0]
    K = int(n_keys)
    # 1. Slab-local sort by key (one Pallas dispatch).
    ks, (pay_s,) = slab_sort(key, [payload], slab_log=slab_log,
                             interpret=interpret)
    slab = 1 << min(slab_log, max((R - 1).bit_length(), 10))
    Rp_in = -(-R // slab) * slab
    G = Rp_in // slab
    # slab_sort pads the tail cell with I32_MAX keys — they sort last and
    # fall outside [0, K), so searchsorted drops them from every bucket.
    ks3 = jnp.pad(ks, (0, Rp_in - R),
                  constant_values=jnp.int32(2**31 - 1)).reshape(G, slab)
    pay3 = jnp.pad(pay_s, (0, Rp_in - R)).reshape(G, slab)

    # 2. Counting glue (small: G x (K+1)).
    edges = jnp.arange(K + 1, dtype=jnp.int32)
    ss = jax.vmap(lambda row: jnp.searchsorted(row, edges))(ks3)
    C = (ss[:, 1:] - ss[:, :-1]).astype(jnp.int32)  # (G, K)
    H = C.sum(axis=0)  # (K,)
    region = H + chunk  # +chunk: spill gap per key
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(region)[:-1]]).astype(jnp.int32)
    # Exclusive scan over cells: base of (g, k).
    cell_base = starts[None, :] + jnp.concatenate(
        [jnp.zeros((1, K), jnp.int32),
         jnp.cumsum(C, axis=0)[:-1]], axis=0)  # (G, K)

    # 3. Compact run lists. MAXR = K keeps shapes static; the kernel's
    # while-loop reads only the first nruns[g] entries.
    present = C > 0
    nruns = present.sum(axis=1).astype(jnp.int32)  # (G,)
    pos = jnp.cumsum(present, axis=1) - 1  # (G, K) target slot
    pos = jnp.where(present, pos, K)  # parked -> dropped
    g_idx = jnp.broadcast_to(jnp.arange(G)[:, None], (G, K))
    src_all = ss[:, :-1].astype(jnp.int32)  # run start inside the cell
    run_src = jnp.zeros((G, K), jnp.int32).at[g_idx, pos].set(
        src_all, mode="drop")
    run_dst = jnp.zeros((G, K), jnp.int32).at[g_idx, pos].set(
        cell_base, mode="drop")
    run_len = jnp.zeros((G, K), jnp.int32).at[g_idx, pos].set(
        C, mode="drop")

    # sum(H) = R, each key region carries a +chunk gap, plus one final
    # safety gap (Rp_in - R tail pads never scatter: their keys >= K).
    out_rows = Rp_in + (K + 1) * chunk
    data2 = jnp.concatenate(
        [pay3, jnp.zeros((G, chunk), jnp.int32)], axis=1)
    out = scatter_runs(data2, nruns, run_src, run_dst, run_len,
                       out_rows=out_rows, chunk=chunk,
                       interpret=interpret)
    return out, starts, H


def block_regroup(key: jnp.ndarray, ray: jnp.ndarray, n_keys: int,
                  tile: int = 1024, chunk: int = CHUNK,
                  slab_log: int = 16, interpret: bool = False):
    """Group (key, ray) pairs into single-key blocks of ``tile`` pairs —
    the treelet phase-2 layout (ops/treelet_pipeline.py) — replacing the
    lax.sort + rank + scatter binning glue with the counting-scatter path.

    Keys >= n_keys (the pipeline's dump-key empties) are dropped. Output
    key regions are tile-aligned with a >= ``chunk`` spill gap, so every
    ``tile``-pair block holds pairs of ONE key; padding lanes carry
    on = 0 (phase 2 retires them immediately). Returns
    (ray_out (B*tile,), sid_blocks (B,), on (B*tile,) int32) with static
    B = (R + n_keys*(tile + chunk) + tile) / tile rounded up.
    """
    R = key.shape[0]
    K = int(n_keys)
    ks, (ray_s,) = slab_sort(key, [ray], slab_log=slab_log,
                             interpret=interpret)
    slab = 1 << min(slab_log, max((R - 1).bit_length(), 10))
    Rp_in = -(-R // slab) * slab
    G = Rp_in // slab
    ks3 = jnp.pad(ks, (0, Rp_in - R),
                  constant_values=jnp.int32(2**31 - 1)).reshape(G, slab)
    ray3 = jnp.pad(ray_s, (0, Rp_in - R)).reshape(G, slab)

    edges = jnp.arange(K + 1, dtype=jnp.int32)
    ss = jax.vmap(lambda row: jnp.searchsorted(row, edges))(ks3)
    C = (ss[:, 1:] - ss[:, :-1]).astype(jnp.int32)
    H = C.sum(axis=0)
    # Tile-aligned regions with a guaranteed spill gap: chunk <= gap < 
    # tile + chunk.
    region = (-(-(H + chunk) // tile) * tile).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(region)[:-1]]).astype(jnp.int32)
    cell_base = starts[None, :] + jnp.concatenate(
        [jnp.zeros((1, K), jnp.int32),
         jnp.cumsum(C, axis=0)[:-1]], axis=0)

    present = C > 0
    nruns = present.sum(axis=1).astype(jnp.int32)
    pos = jnp.cumsum(present, axis=1) - 1
    pos = jnp.where(present, pos, K)
    g_idx = jnp.broadcast_to(jnp.arange(G)[:, None], (G, K))
    run_src = jnp.zeros((G, K), jnp.int32).at[g_idx, pos].set(
        ss[:, :-1].astype(jnp.int32), mode="drop")
    run_dst = jnp.zeros((G, K), jnp.int32).at[g_idx, pos].set(
        cell_base, mode="drop")
    run_len = jnp.zeros((G, K), jnp.int32).at[g_idx, pos].set(
        C, mode="drop")

    # Static capacity: sum(region) <= sum(H) + K*(tile + chunk) <= bound.
    out_rows = -(-(R + K * (tile + chunk) + tile) // tile) * tile
    data2 = jnp.concatenate(
        [ray3, jnp.zeros((G, chunk), jnp.int32)], axis=1)
    out = scatter_runs(data2, nruns, run_src, run_dst, run_len,
                       out_rows=out_rows, chunk=chunk,
                       interpret=interpret)

    B = out_rows // tile
    block_start = jnp.arange(B, dtype=jnp.int32) * tile
    sid_blocks = jnp.clip(
        jnp.searchsorted(starts, block_start, side="right") - 1,
        0, K - 1).astype(jnp.int32)
    slot = jnp.arange(out_rows, dtype=jnp.int32)
    sid_of_slot = jnp.repeat(sid_blocks, tile)
    on = (slot - starts[sid_of_slot] < H[sid_of_slot]).astype(jnp.int32)
    ray_out = jnp.clip(out, 0, R - 1)
    return ray_out, sid_blocks, on
