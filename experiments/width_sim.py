"""Does a 16-ary collapse cut sub-packet step counts enough to matter?

Walks the DP cluster structure directly (no row table needed): a visit =
one fetched row equivalent. For width=16 an internal node is TWO 128-lane
rows (16 children x 16 floats), so its internal visits are charged
double-fetch but single-step — the kernel cost model is per STEP, so
steps are the metric (internal visit = 1 step regardless of width; leaf
visit = 1 step).

Usage: python experiments/width_sim.py [n_cells]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


def build_cluster_tree(bvh, tri9, width):
    from loupiote_tpu.accel.wide import _dp_clusters

    wide_children, wide_of, leaf_nodes, leaf_row_of, tris, firstmin = \
        _dp_clusters(bvh, width)
    # Child entry: (bmin, bmax, kind, index): kind 0 = wide node id,
    # kind 1 = leaf row id.
    nodes = []
    for mem in wide_children:
        entry = []
        for m in mem:
            if m in leaf_row_of:
                entry.append((bvh.node_min[m], bvh.node_max[m], 1,
                              leaf_row_of[m]))
            else:
                entry.append((bvh.node_min[m], bvh.node_max[m], 0,
                              wide_of[m]))
        nodes.append(entry)
    leaves = [(int(firstmin[n]), int(tris[n])) for n in leaf_nodes]
    return nodes, leaves


def simulate(nodes, leaves, tri9, o, d, act):
    n = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d,
                         np.where(d >= 0, 1e-20, -1e-20))
    t = np.full(n, 1e30, np.float32)
    internal = leaf = 0
    stack = [(0, 0)]
    while stack:
        kind, idx = stack.pop()
        if kind == 1:
            leaf += 1
            f, c = leaves[idx]
            for k in range(c):
                p0, e1, e2 = (tri9[f + k, 0:3], tri9[f + k, 3:6],
                              tri9[f + k, 6:9])
                pv = np.cross(d, e2)
                det = (e1 * pv).sum(1)
                ivd = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
                tv = o - p0
                uu = (tv * pv).sum(1) * ivd
                qv = np.cross(tv, e1)
                vv = (d * qv).sum(1) * ivd
                tt = ((e2 * qv).sum(1) * ivd).astype(np.float32)
                ok = ((uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (ivd != 0)
                      & (tt > 1e-4) & (tt < t) & act)
                t = np.where(ok, tt, t)
            continue
        internal += 1
        hits = []
        for bmin, bmax, ckind, cidx in nodes[idx]:
            t1 = (bmin - o) * inv
            t2 = (bmax - o) * inv
            tn = np.minimum(t1, t2).max(1)
            tf = np.maximum(t1, t2).min(1)
            h = (tf >= np.maximum(tn, 0)) & (tn < t) & act
            if h.any():
                hits.append((float(np.where(h, tn, 3e30).min()),
                             ckind, cidx))
        hits.sort(key=lambda x: x[0])
        for tn, ck, ci in reversed(hits[1:]):
            stack.append((ck, ci))
        if hits:
            stack.append((hits[0][1], hits[0][2]))
    return internal, leaf


def main(n_cells=3):
    from loupiote_tpu.accel.bvh import build_bvh
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    scene = build_arch_scene(260_000)
    bufs = build_scene_buffers(scene)
    tri9 = np.asarray(bufs.tri_pack)[:bufs.num_tris, :9]

    # Reconstruct the FlatBVH from the packed node table.
    npk = np.asarray(bufs.node_pack)[:bufs.num_nodes]
    from loupiote_tpu.accel.bvh import FlatBVH

    bvh = FlatBVH(
        node_min=npk[:, 0:3], node_max=npk[:, 3:6],
        first=npk[:, 6].view(np.int32), count=npk[:, 7].view(np.int32),
        miss=npk[:, 8].view(np.int32), right=npk[:, 9].view(np.int32),
        axis=npk[:, 10].view(np.int32),
        tri_order=np.arange(bufs.num_tris, dtype=np.int32))

    rng = np.random.default_rng(3)
    R = dro.shape[0]
    cells = rng.choice(R // 1024, size=n_cells, replace=False)
    for width in (8, 16):
        t0 = time.time()
        nodes, leaves = build_cluster_tree(bvh, tri9, width)
        bt = time.time() - t0
        tot_i = tot_l = pk = 0
        for ci in cells:
            base = ci * 1024
            for p in range(8):
                sl = slice(base + p * 128, base + (p + 1) * 128)
                it, lf = simulate(nodes, leaves, tri9, dro[sl], drd[sl],
                                  alive[sl])
                tot_i += it
                tot_l += lf
                pk += 1
        print(f"width={width:2d}: rows={len(nodes)}+{len(leaves)} "
              f"(build {bt:.0f}s)  int/pkt {tot_i/pk:6.1f}  "
              f"leaf/pkt {tot_l/pk:6.1f}  steps/pkt "
              f"{(tot_i+tot_l)/pk:6.1f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
