"""Per-lane top-tree walk (ops/lane_top.py): phase 1 of the treelet
pipeline. Verifies (a) the kernel against a scalar numpy walk of the same
tables, and (b) the tables against the tree: every actual hit lies under a
pended frontier subtree (coverage), and pendings are only hit-tested boxes
(pruning)."""

import jax.numpy as jnp
import numpy as np
import pytest

from loupiote_tpu.accel.bvh import build_bvh
from loupiote_tpu.accel.wide import LEAF_MASK, collapse_wide_maps
from loupiote_tpu.ops.intersect import intersect_rays
from experiments.treelet.lane_top import (ID_BITS, ID_MASK, PEND_CAP,
                                           TILE, build_top_tables,
                                           lane_top_trace)
from loupiote_tpu.scene import Scene, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh

from test_bvh import random_tris


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    n = 3000
    v0, v1, v2 = random_tris(rng, n, spread=12.0, size=0.6)
    scene = Scene.default()
    pos = np.empty((n * 3, 3), np.float32)
    pos[0::3], pos[1::3], pos[2::3] = v0, v1, v2
    scene.meshes.append(Mesh(pos, None, None,
                             np.arange(n * 3, dtype=np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    bufs = build_scene_buffers(scene)
    bvh = build_bvh(
        np.ascontiguousarray(v0), np.ascontiguousarray(v1),
        np.ascontiguousarray(v2))
    tables = build_top_tables(bvh, top_wide=48)
    return bufs, bvh, tables, (v0, v1, v2)


def _rays(tris, R, seed=3):
    rng = np.random.default_rng(seed)
    v0, v1, _ = tris
    n = len(v0)
    ro = ((rng.random((R, 3)) - 0.5) * 28).astype(np.float32)
    tgt = (v0[rng.integers(0, n, R)] + v1[rng.integers(0, n, R)]) / 2
    rd = np.where(rng.random((R, 1)) < 0.7, tgt - ro,
                  rng.random((R, 3)) - 0.5).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


def _walk_table(tables, ro, rd):
    """Scalar reference walk of the top tables (one ray)."""
    f = tables.fields.reshape(8, -1)
    link = f[6].view(np.int32)
    pend = f[7].view(np.int32)
    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                         np.where(rd >= 0, 1e-20, -1e-20))
    cur, out = 0, []
    for _ in range(4 * tables.num_top + 64):
        if cur == ID_MASK:
            break
        lo = np.array([f[0][cur], f[1][cur], f[2][cur]])
        hi = np.array([f[3][cur], f[4][cur], f[5][cur]])
        t1, t2 = (lo - ro) * inv, (hi - ro) * inv
        tn = np.minimum(t1, t2).max()
        tf = np.maximum(t1, t2).min()
        hit = tf >= max(tn, 0.0)
        hid = link[cur] & ID_MASK
        mid = (link[cur] >> ID_BITS) & ID_MASK
        if hit and pend[cur] >= 0 and len(out) < PEND_CAP:
            out.append(int(pend[cur]))
        if hit and hid != ID_MASK:
            cur = hid
        else:
            cur = mid
    return out


def test_kernel_matches_scalar_walk(setup):
    bufs, bvh, tables, tris = setup
    ro, rd = _rays(tris, TILE)
    pend, npend = lane_top_trace(tables, jnp.asarray(ro), jnp.asarray(rd),
                                 interpret=True)
    pend, npend = np.asarray(pend), np.asarray(npend)
    for i in range(0, TILE, 37):
        ref = _walk_table(tables, ro[i], rd[i])
        got = [int(x) for x in pend[i][:npend[i]]]
        assert got == ref, (i, got, ref)


def test_coverage_and_pruning(setup):
    """Every real hit's frontier-subtree row must be pended (coverage);
    pendings must be boxes the ray actually hits (pruning)."""
    bufs, bvh, tables, tris = setup
    ro, rd = _rays(tris, TILE, seed=9)
    hit = intersect_rays(bufs, jnp.asarray(ro), jnp.asarray(rd))
    # Production pattern: phase 1 runs with the best-known t bound (the
    # wave's tmax / current best hit); without it an unpruned walk can
    # overflow the pending cap (that's what resumable rounds are for).
    tmax = jnp.asarray(np.asarray(hit.t) * 1.001)
    pend, npend = lane_top_trace(tables, jnp.asarray(ro), jnp.asarray(rd),
                                 tmax=tmax, interpret=True)
    pend, npend = np.asarray(pend), np.asarray(npend)

    # Frontier row of each triangle: the pended row under which it lives.
    wide_of, leaf_row_of, W = collapse_wide_maps(bvh)
    f = tables.fields.reshape(8, -1)
    pend_rows = set(int(p) for p in f[7].view(np.int32) if p >= 0)
    # Map each triangle to its leaf node, then ascend: a pre-order ancestor
    # of node j is any i <= j with miss[i] > j.
    leaf_of_tri = np.zeros(bufs.num_tris, np.int64)
    for n2 in np.nonzero(bvh.count > 0)[0]:
        first, cnt = int(bvh.first[n2]), int(bvh.count[n2])
        leaf_of_tri[first:first + cnt] = n2

    def frontier_row_of(tri):
        j = int(leaf_of_tri[tri])
        cands = []
        if (W + leaf_row_of.get(j, -1)) | (1 << 30) in pend_rows \
           and j in leaf_row_of:
            cands.append((j, (W + leaf_row_of[j]) | (1 << 30)))
        for i in range(j + 1):
            if bvh.miss[i] > j and i in wide_of:
                row = wide_of[i]
                if row in pend_rows:
                    cands.append((i, row))
        # deepest (largest pre-order index) pended ancestor
        return max(cands)[1] if cands else None

    tri_all = np.asarray(hit.tri)
    cand = np.nonzero((tri_all >= 0) & (npend < PEND_CAP))[0]
    assert len(cand) > 50
    checked = 0
    for i in cand[:60]:
        tri = int(tri_all[i])
        row = frontier_row_of(tri)
        assert row is not None, (i, tri)
        assert row in set(int(x) for x in pend[i][:npend[i]]), (
            i, tri, row, pend[i][:npend[i]])
        checked += 1
    assert checked >= 50

    # Pruning: a pended row's box must be hit by the ray (spot check via
    # the scalar walk equivalence, already covered above); ensure pend
    # lists are generally short.
    live = npend[npend < PEND_CAP]
    assert live.mean() < PEND_CAP / 2


def test_pend_rows_are_valid(setup):
    bufs, bvh, tables, _ = setup
    f = tables.fields.reshape(8, -1)
    pend = f[7].view(np.int32)
    valid = pend[pend >= 0] & LEAF_MASK
    assert (valid < bufs.wide_end).all()
