"""BVH traversal + ray-triangle intersection (the IntersectorPass analog).

Reference behavior: ``IntersectorPass`` dispatches one thread per pixel and
writes an ``Intersection`` record per ray (`crates/lib/src/renderer.rs:453-464`;
kernel source not mounted — semantics are classic BVH + Moller-Trumbore).

TPU-native design: rays are a flat (R,) SoA batch. Traversal is a single
``lax.while_loop`` over a *threaded* BVH (see accel/bvh.py): every ray holds
one int of state (current node) and steps via hit/miss links — no stacks, no
data-dependent shapes, only row gathers from HBM. All lanes advance in
lockstep with masking; rays that finish park at the END sentinel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..accel.bvh import LEAF_MAX

INVALID_TRI = jnp.int32(-1)
T_MIN = 1e-4
T_FAR = 1e30


class Hit(NamedTuple):
    """Per-ray intersection record (the ``Intersection`` SSBO analog)."""

    t: jnp.ndarray  # (R,) float32, T_FAR when miss
    tri: jnp.ndarray  # (R,) int32, -1 when miss
    u: jnp.ndarray  # (R,) float32 barycentric
    v: jnp.ndarray  # (R,) float32 barycentric


def _bitcast_i32(x):
    return lax.bitcast_convert_type(x, jnp.int32)


def intersect_rays(scene, ro, rd, tmax=None, active=None,
                   any_hit: bool = False, max_steps: int | None = None) -> Hit:
    """Trace rays against the scene BVH.

    Args:
      scene: SceneBuffers.
      ro, rd: (R, 3) float32 ray origins / directions (rd need not be unit).
      tmax: optional (R,) float32 upper bound (e.g. shadow ray length).
      active: optional (R,) bool; inactive rays return a miss.
      any_hit: stop a ray at its first confirmed hit (shadow rays).
      max_steps: safety bound on traversal iterations (default 4 * nodes).
    """
    R = ro.shape[0]
    end = jnp.int32(scene.end_index)
    node0 = jnp.zeros(R, jnp.int32)
    if active is not None:
        node0 = jnp.where(active, node0, end)

    t0 = jnp.full(R, T_FAR, jnp.float32) if tmax is None else tmax.astype(jnp.float32)
    inv_d = 1.0 / jnp.where(jnp.abs(rd) > 1e-20, rd, jnp.where(rd >= 0, 1e-20, -1e-20))

    if max_steps is None:
        max_steps = 4 * scene.num_nodes + 64

    class S(NamedTuple):
        node: jnp.ndarray
        t: jnp.ndarray
        tri: jnp.ndarray
        u: jnp.ndarray
        v: jnp.ndarray
        steps: jnp.ndarray

    def cond(s: S):
        return jnp.logical_and(jnp.any(s.node != end), s.steps < max_steps)

    def body(s: S):
        nidx = jnp.minimum(s.node, end - 1)  # clamp parked rays; masked below
        row = scene.node_pack[nidx]  # (R, 9) single gather
        nmin = row[:, 0:3]
        nmax = row[:, 3:6]
        first = _bitcast_i32(row[:, 6])
        count = _bitcast_i32(row[:, 7])
        miss = _bitcast_i32(row[:, 8])

        live = s.node != end

        # Slab test against current best t.
        t1 = (nmin - ro) * inv_d
        t2 = (nmax - ro) * inv_d
        tnear = jnp.max(jnp.minimum(t1, t2), axis=1)
        tfar = jnp.min(jnp.maximum(t1, t2), axis=1)
        box_hit = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < s.t) & live

        is_leaf = count > 0
        do_leaf = box_hit & is_leaf

        # Leaf: test up to LEAF_MAX triangles (Moller-Trumbore), masked.
        t_best, tri_best, u_best, v_best = s.t, s.tri, s.u, s.v
        for k in range(LEAF_MAX):
            tri_idx = first + k
            valid = do_leaf & (k < count)
            safe_idx = jnp.where(valid, tri_idx, 0)
            trow = scene.tri_pack[safe_idx]  # (R, 9)
            p0 = trow[:, 0:3]
            e1 = trow[:, 3:6]
            e2 = trow[:, 6:9]
            pvec = jnp.cross(rd, e2)
            det = jnp.sum(e1 * pvec, axis=1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = ro - p0
            u = jnp.sum(tvec * pvec, axis=1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(rd * qvec, axis=1) * inv_det
            t = jnp.sum(e2 * qvec, axis=1) * inv_det
            ok = (valid & (jnp.abs(det) > 1e-12)
                  & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t > T_MIN) & (t < t_best))
            t_best = jnp.where(ok, t, t_best)
            tri_best = jnp.where(ok, tri_idx, tri_best)
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)

        # Next node: descend on internal hit, else follow miss link.
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, s.node + 1, miss)
        nxt = jnp.where(live, nxt, end)
        if any_hit:
            nxt = jnp.where(tri_best != INVALID_TRI, end, nxt)

        return S(nxt, t_best, tri_best, u_best, v_best, s.steps + 1)

    init = S(node0, t0, jnp.full(R, INVALID_TRI), jnp.zeros(R, jnp.float32),
             jnp.zeros(R, jnp.float32), jnp.int32(0))
    out = lax.while_loop(cond, body, init)
    return Hit(out.t, out.tri, out.u, out.v)


def occluded(scene, ro, rd, dist, active=None) -> jnp.ndarray:
    """Shadow query: True where the segment [T_MIN, dist) is blocked."""
    hit = intersect_rays(scene, ro, rd,
                         tmax=dist * (1.0 - 1e-3), active=active, any_hit=True)
    return hit.tri != INVALID_TRI
