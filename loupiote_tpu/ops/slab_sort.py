"""Pallas TPU slab-local bitonic sort carrying arbitrary payload columns.

The inter-bounce ray regroup was ~410 ms of frame glue at 1080p (VERDICT
r3): XLA argsort ~160 ns/key plus ~25 ms per permuted field gather, all in
HBM. Host-replay measurement (experiments/slab_sort_sim.py) shows that
sorting within INDEPENDENT 64k-ray slabs recovers the global sort's packet
coherence exactly (137.3 vs 137.4 steps/packet on the arch-260k diffuse
wave, even from a random shuffle), so the regroup never needs global data
movement. A 64k slab fits VMEM, which turns the whole regroup into ONE
kernel dispatch whose compare-swap stages run at register speed:

  grid cell g = one slab: full ascending bitonic sort of (key, payload...)
  (log2(64k)^2 / 2 = 136 stages), all columns swapped under the key's
  select mask. No cross-slab merge — that merge phase is what made the
  global bitonic (ops/device_sort.py) a measured negative result (its
  ~20 sequential pallas_calls each pay HBM + dispatch; the slab sort is
  one call and one HBM round trip).

The reference has no analog (its wavefront loop never reorders rays);
this implements SURVEY.md §7's wavefront-performance pass the TPU way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax import lax

LANES = 128
I32_MAX = jnp.int32(2**31 - 1)


# Bitonic-network primitives, shared with the archived global bitonic sort
# (experiments/treelet/device_sort.py — measured slower than XLA's sort,
# kept as a negative result; this slab-local form measured FASTER:
# 10.6 vs 12.3 ns/elem on device, round 4).

def _partner(x, d, rows):
    """Partner values at XOR distance d within one (rows, 128) block."""
    if d < LANES:
        lane = lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        lo = (lane & d) == 0
        # pltpu.roll needs a non-negative shift: -d == LANES - d (mod 128).
        return jnp.where(lo, pltpu.roll(x, LANES - d, 1),
                         pltpu.roll(x, d, 1))
    dr = d // LANES
    row = lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lo = (row & dr) == 0
    return jnp.where(lo, jnp.roll(x, -dr, 0), jnp.roll(x, dr, 0))


def _upper_bit(d, rows):
    """(rows, 128) bool: element is the upper member of its d-pair."""
    if d < LANES:
        lane = lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        return (lane & d) != 0
    row = lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    return (row & (d // LANES)) != 0


def _asc_bit(k_level, rows, c_log, chunk_bit):
    """(rows, 128) bool: ascending flag = global-index bit ``k_level`` is
    clear. Bits < c_log come from local iotas; higher bits from the chunk
    id (``chunk_bit``: traced scalar 0/1)."""
    if k_level < 7:
        lane = lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        return ((lane >> k_level) & 1) == 0
    if k_level < c_log:
        row = lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        return ((row >> (k_level - 7)) & 1) == 0
    # Broadcast the int and compare on-vector (cmpi -> i1); broadcasting
    # a scalar bool lands in the same i8->i1 trunc Mosaic rejects.
    return lax.broadcast(jnp.int32(chunk_bit), (rows, LANES)) == 0


def _slab_kernel(k_ref, *refs, c_log: int, n_payload: int):
    """refs = payload_in x n_payload, key_out, payload_out x n_payload."""
    rows = 1 << max(c_log - 7, 0)
    p_in = refs[:n_payload]
    ko_ref = refs[n_payload]
    p_out = refs[n_payload + 1:]

    kx = k_ref[0]
    cols = [r[0] for r in p_in]
    for k_level in range(1, c_log + 1):
        for j in range(k_level - 1, -1, -1):
            d = 1 << j
            kp = _partner(kx, d, rows)
            up = _upper_bit(d, rows)
            asc = _asc_bit(k_level, rows, c_log, 0)
            take_min = asc ^ up
            # One select mask from the keys drives every column's swap.
            sel = (take_min & (kp < kx)) | (~take_min & (kx < kp))
            kx = jnp.where(sel, kp, kx)
            cols = [jnp.where(sel, _partner(c, d, rows), c) for c in cols]
    ko_ref[0] = kx
    for r, c in zip(p_out, cols):
        r[0] = c


@functools.partial(jax.jit, static_argnames=("c_log", "interpret"))
def _slab_sort_padded(keys3, payload3, *, c_log: int,
                      interpret: bool = False):
    G, rows, _ = keys3.shape
    n_payload = len(payload3)
    spec = pl.BlockSpec((1, rows, LANES), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(keys3.shape, jnp.int32)] * (
        1 + n_payload)
    out = pl.pallas_call(
        functools.partial(_slab_kernel, c_log=c_log, n_payload=n_payload),
        grid=(G,),
        in_specs=[spec] * (1 + n_payload),
        out_specs=[spec] * (1 + n_payload),
        out_shape=out_shape,
        # The 136 compare-swap stages keep key + all payload columns live;
        # at frame scale (16 payload columns x 64k-ray slabs) the scoped
        # stack needs ~27 MB — Mosaic's default 16 MB limit OOMs the
        # compile (round-5 device window, artifacts/r5_device1/
        # frame_sort_ab.log). v5e VMEM is 128 MB; match the traversal
        # kernels' explicit budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(keys3, *payload3)
    return out[0], list(out[1:])


def slab_sort(key: jnp.ndarray, payload: list, slab_log: int = 16,
              interpret: bool = False):
    """Sort ``key`` (uint32/int32, (R,)) ascending WITHIN each 2^slab_log
    slab, applying the same permutation to every (R,)-shaped int32/float32
    column in ``payload``. Returns (key_sorted, payload_sorted) with the
    original dtypes. Unsigned order is used for uint32 keys (so
    0xFFFFFFFF dead-ray keys still sort last, as with jnp.argsort).
    """
    R = key.shape[0]
    n_log = max((R - 1).bit_length(), 10)
    c_log = min(slab_log, n_log)
    slab = 1 << c_log
    rows = 1 << max(c_log - 7, 0)
    Rp = -(-R // slab) * slab
    G = Rp // slab

    if key.dtype == jnp.uint32:
        # Unsigned -> signed order-preserving map (flip the sign bit).
        k32 = (key ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    else:
        k32 = key.astype(jnp.int32)
    kp = jnp.full(Rp, I32_MAX, jnp.int32).at[:R].set(k32)
    keys3 = kp.reshape(G, rows, LANES)

    cols3, dtypes = [], []
    for col in payload:
        dtypes.append(col.dtype)
        if col.dtype == jnp.bool_:
            c32 = col.astype(jnp.int32)
        elif col.dtype == jnp.int32:
            c32 = col
        else:
            c32 = jax.lax.bitcast_convert_type(col, jnp.int32)
        cp = jnp.zeros(Rp, jnp.int32).at[:R].set(c32)
        cols3.append(cp.reshape(G, rows, LANES))

    ks, outs = _slab_sort_padded(keys3, cols3, c_log=c_log,
                                 interpret=interpret)
    ks = ks.reshape(-1)[:R]
    if key.dtype == jnp.uint32:
        ks = jax.lax.bitcast_convert_type(ks, jnp.uint32) \
            ^ jnp.uint32(0x80000000)
    result = []
    for o, dt in zip(outs, dtypes):
        flat = o.reshape(-1)[:R]
        if dt == jnp.int32:
            result.append(flat)
        elif dt == jnp.bool_:
            result.append(flat != 0)
        else:
            result.append(jax.lax.bitcast_convert_type(flat, dt))
    return ks, result
