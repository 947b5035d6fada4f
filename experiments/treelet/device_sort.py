"""Pallas TPU global bitonic sort for (key, payload) int32 wave-scale data.

Why this exists: XLA's TPU sort/argsort/scatter/gather all move data at
~160-285 ns/element at wave scale (measured, experiments/r3_probes.py
`sort`/`perm` probes: argsort 8.4M = 672 ms, applying a known permutation
2.3 s) — the single wall in front of every regroup-shaped pass (ray
reordering between bounces, the treelet pipeline's pair binning). A
bitonic network has only STATIC exchange distances, so every compare-swap
lowers to VPU rolls/selects with zero dynamic addressing: data moves at
register speed inside a VMEM-resident chunk and at HBM streaming speed
across chunks.

Structure (N = padded pow2, C = chunk = 2^c_log elements VMEM-resident):
  kernel A      per-chunk full bitonic sort, levels k = 1..c_log
                (direction bits of the GLOBAL network, so chunks come out
                alternately ascending/descending as the merge expects)
  per level k > c_log:
    kernel X    cross-chunk compare-swap for stages j = k-1..c_log
                (one elementwise pass per stage, output block g reads
                blocks g and g ^ 2^(j-c_log))
    kernel D    per-chunk merge descent, stages j = c_log-1..0

MEASURED RESULT (v5e, 2026-08-17): does not beat XLA's sort — kept as a
tested negative result so the next round does not rebuild it.
  8.4M pairs: device_sort 5425 ms vs lax.sort 3334 ms (same window)
  2.1M pairs: device_sort  437 ms vs lax.sort  679 ms (same window,
              but argsort measured 194 ms in a calmer window)
~210-650 ns/element and superlinear growth: the network is not HBM-bound
as hoped but VPU-bound on the compare-swap stages — each stage is 4
pltpu.rolls + masks + selects over the full array, and the c_log=16
chunk phase alone is 136 such stages. Per ROADMAP's rule ("does it cut
vector-op count per element") a bitonic network fails by construction:
O(log^2 n) full-array passes. The 10x regroup speedup the treelet
pipeline needs is out of reach on this axis.
Production code therefore keeps jnp.argsort / lax.sort (ops/sort.py,
ops/treelet_pipeline.py). A counting-sort/radix design with dense DMA
runs is the only remaining shape that could beat XLA here.

The reference has no analog (single-GPU wgpu; sorting happens nowhere in
loupiote). Cited for parity context only: SURVEY.md §2.2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from loupiote_tpu.ops.slab_sort import _asc_bit, _partner, _upper_bit

LANES = 128
I32_MAX = jnp.int32(2**31 - 1)


def _cmp_swap(k, v, kp, vp, take_min):
    """Directed compare-swap against partner values (kp, vp). The select
    mask is composed with i1 logical ops only — a bool-valued jnp.where
    here materializes an i8 vector whose i1 truncation Mosaic rejects
    ("Unsupported target bitwidth for truncation")."""
    sel = (take_min & (kp < k)) | (~take_min & (k < kp))
    return jnp.where(sel, kp, k), jnp.where(sel, vp, v)





def _stage(kx, vx, j, k_level, rows, c_log, chunk_bit):
    d = 1 << j
    kp = _partner(kx, d, rows)
    vp = _partner(vx, d, rows)
    up = _upper_bit(d, rows)
    asc = _asc_bit(k_level, rows, c_log, chunk_bit)
    take_min = asc ^ up
    return _cmp_swap(kx, vx, kp, vp, take_min)


def _chunk_sort_kernel(k_ref, v_ref, ko_ref, vo_ref, *, c_log: int):
    rows = 1 << max(c_log - 7, 0)
    g = pl.program_id(0)
    kx, vx = k_ref[0], v_ref[0]
    for k_level in range(1, c_log + 1):
        cb = (g >> max(k_level - c_log, 0)) & 1 if k_level >= c_log else 0
        for j in range(k_level - 1, -1, -1):
            kx, vx = _stage(kx, vx, j, k_level, rows, c_log, cb)
    ko_ref[0], vo_ref[0] = kx, vx


def _descent_kernel(k_ref, v_ref, ko_ref, vo_ref, *, c_log: int,
                    k_level: int):
    rows = 1 << max(c_log - 7, 0)
    cb = (pl.program_id(0) >> (k_level - c_log)) & 1
    kx, vx = k_ref[0], v_ref[0]
    for j in range(c_log - 1, -1, -1):
        kx, vx = _stage(kx, vx, j, k_level, rows, c_log, cb)
    ko_ref[0], vo_ref[0] = kx, vx


def _cross_kernel(ka_ref, va_ref, kb_ref, vb_ref, ko_ref, vo_ref, *,
                  c_log: int, k_level: int, j: int):
    """Output block g: compare-swap against partner block g ^ 2^(j-c_log);
    keeps min or max depending on which member of the pair g is and the
    level's direction bit."""
    rows = 1 << max(c_log - 7, 0)
    g = pl.program_id(0)
    # take_min = asc XOR up, kept as an int until the vector compare.
    tm = (((g >> (k_level - c_log)) & 1) ^ 1) ^ ((g >> (j - c_log)) & 1)
    kx, vx = ka_ref[0], va_ref[0]
    kp, vp = kb_ref[0], vb_ref[0]
    ko, vo = _cmp_swap(kx, vx, kp, vp,
                       lax.broadcast(jnp.int32(tm), (rows, LANES)) != 0)
    ko_ref[0], vo_ref[0] = ko, vo


def _block_specs(rows, n, index_map=None):
    im = index_map if index_map is not None else (lambda g: (g, 0, 0))
    return pl.BlockSpec((1, rows, LANES), im, memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("c_log", "interpret"))
def _sort_padded(keys3, vals3, *, c_log: int, interpret: bool = False):
    """keys3/vals3: (G, rows, 128) int32, G a power of two. Full global
    ascending bitonic sort, returned in the same shape."""
    G, rows, _ = keys3.shape
    n_log = c_log + (G - 1).bit_length()
    out_shape = [jax.ShapeDtypeStruct(keys3.shape, jnp.int32)] * 2

    def call(kernel, n_in, index_maps=None, **kw):
        maps = index_maps or [None] * n_in
        return pl.pallas_call(
            functools.partial(kernel, c_log=c_log, **kw),
            grid=(G,),
            in_specs=[_block_specs(rows, G, m) for m in maps],
            out_specs=[_block_specs(rows, G)] * 2,
            out_shape=out_shape,
            interpret=interpret,
        )

    keys3, vals3 = call(_chunk_sort_kernel, 2)(keys3, vals3)
    for k_level in range(c_log + 1, n_log + 1):
        for j in range(k_level - 1, c_log - 1, -1):
            dc = 1 << (j - c_log)
            maps = [lambda g: (g, 0, 0), lambda g: (g, 0, 0),
                    lambda g, dc=dc: (g ^ dc, 0, 0),
                    lambda g, dc=dc: (g ^ dc, 0, 0)]
            keys3, vals3 = call(_cross_kernel, 4, index_maps=maps,
                                k_level=k_level, j=j)(
                keys3, vals3, keys3, vals3)
        keys3, vals3 = call(_descent_kernel, 2, k_level=k_level)(
            keys3, vals3)
    return keys3, vals3


def device_sort(keys: jnp.ndarray, vals: jnp.ndarray | None = None,
                chunk_log: int = 16, interpret: bool = False):
    """Ascending sort of int32 ``keys`` (with optional int32 payload
    ``vals``) via the global bitonic network. Keys must be < 2^31 - 1
    (I32_MAX is the internal padding sentinel). Returns sorted keys (and
    permuted vals). Not stable.
    """
    n = keys.shape[0]
    if vals is None:
        vals = jnp.zeros_like(keys)
    n_log = max((n - 1).bit_length(), 10)
    c_log = min(chunk_log, n_log)
    n_pad = 1 << n_log
    rows = 1 << max(c_log - 7, 0)
    G = n_pad // (1 << c_log)
    kp = jnp.full(n_pad, I32_MAX, jnp.int32).at[:n].set(keys)
    vp = jnp.zeros(n_pad, jnp.int32).at[:n].set(vals)
    k3 = kp.reshape(G, rows, LANES)
    v3 = vp.reshape(G, rows, LANES)
    k3, v3 = _sort_padded(k3, v3, c_log=c_log, interpret=interpret)
    return k3.reshape(-1)[:n], v3.reshape(-1)[:n]
