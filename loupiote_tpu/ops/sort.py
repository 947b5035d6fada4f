"""Ray reordering: Morton-code + direction-octant sort keys.

The wavefront performance pass from SURVEY.md §7 / BASELINE's north star:
between bounces, rays are re-sorted so spatially/directionally similar rays
land in the same 128-ray sub-packet (ops/pallas_intersect.py) and dead rays
compact into sub-packets that retire on their first step. (cf. the ray
reordering literature referenced in PAPERS.md.)
"""

from __future__ import annotations

import jax.numpy as jnp

DEAD_KEY = jnp.uint32(0xFFFFFFFF)


def _spread3(x: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10 bits with two zero bits each (Morton component)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton3(p: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
            bits: int = 10) -> jnp.ndarray:
    """(R,3) positions -> 3*bits-bit Morton codes within [lo, hi]."""
    q = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    scale = (1 << bits) - 1
    qi = (q * scale).astype(jnp.uint32)
    return (_spread3(qi[:, 0]) << 2) | (_spread3(qi[:, 1]) << 1) | _spread3(qi[:, 2])


def direction_octant(d: jnp.ndarray) -> jnp.ndarray:
    return (((d[:, 0] > 0).astype(jnp.uint32) << 2)
            | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
            | (d[:, 2] > 0).astype(jnp.uint32))


def ray_sort_key(ro: jnp.ndarray, rd: jnp.ndarray, alive: jnp.ndarray,
                 lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """uint32 coherence key; dead rays last.

    Two layouts (experiments/sortkey_sim.py, arch-260k diffuse replay):
      oct_m9   direction octant major + origin Morton (round 1-3 key).
      coarseN  top N Morton bits, then octant, then the remaining Morton
               bits — rays are grouped into ~coarse spatial regions FIRST
               and split by direction only within a region. N=9 measured
               108.5 steps/packet vs 142.8 for oct_m9 (-24%): at packet
               scale spatial locality dominates direction purity.
    Selected by LOUPIOTE_SORT_KEY (oct_m9 | coarse<N>); default stays
    oct_m9 until the device A/B lands (round-3 lesson).
    """
    import os

    spec = os.environ.get("LOUPIOTE_SORT_KEY", "oct_m9")
    m = morton3(ro, lo, hi, bits=9) & 0x7FFFFFF
    oct_ = direction_octant(rd)
    if spec.startswith("coarse"):
        nb = int(spec[6:] or 9)
        rest = jnp.uint32(27 - nb)
        top = m >> rest
        key = ((top << (rest + 3)) | (oct_ << rest)
               | (m & ((jnp.uint32(1) << rest) - 1)))
    else:
        key = (oct_ << 27) | m
    return jnp.where(alive, key, DEAD_KEY)


def sort_order(key: jnp.ndarray) -> jnp.ndarray:
    return jnp.argsort(key)


def sort_order_fast(key: jnp.ndarray) -> jnp.ndarray:
    """argsort(key); the name is kept for the experiment record. The
    Pallas global bitonic sort (experiments/treelet/device_sort.py) was
    built to replace
    this and MEASURED SLOWER on v5e: 437 ms vs 194 ms argsort at 2M keys,
    5.4 s vs 3.3 s lax.sort at 8.4M pairs (same contended window) —
    ~650 ns/element, the O(log^2 n) compare-swap stages are pure VPU roll
    traffic. XLA's sort stays."""
    return jnp.argsort(key)
