"""Static quality stats for the wide collapse (host-only, fast).

Reports, for the arch-260k scene: wide-node child fill histogram, leaf-row
triangle fill histogram, row counts, and an SAH-style expected-visit cost
   cost = sum over wide rows of A(row union box) / A(root)
        + C_leaf * sum over leaf rows of A(leaf box) / A(root)
which proxies expected row visits per random ray — the quantity the
sub-packet kernel's step count tracks.

Usage: python experiments/collapse_stats.py [tris]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(tris=260_000):
    from loupiote_tpu.accel.bvh import build_bvh
    from loupiote_tpu.accel.wide import _build_clusters, _dp_clusters
    from loupiote_tpu.scene.procedural import build_arch_scene

    scene = build_arch_scene(tris)
    p0s, p1s, p2s = [], [], []
    for inst in scene.instances:
        m = scene.meshes[inst.mesh_index]
        t = inst.model_to_world
        pos = m.positions @ t[:3, :3].T + t[:3, 3]
        idx = m.indices.reshape(-1, 3).astype(np.int64)
        p0s.append(pos[idx[:, 0]])
        p1s.append(pos[idx[:, 1]])
        p2s.append(pos[idx[:, 2]])
    p0 = np.concatenate(p0s).astype(np.float32)
    p1 = np.concatenate(p1s).astype(np.float32)
    p2 = np.concatenate(p2s).astype(np.float32)
    t0 = time.time()
    bvh = build_bvh(p0, p1, p2)
    print(f"bvh2: {bvh.num_nodes} nodes in {time.time()-t0:.1f}s")

    def area(n):
        d = np.maximum(bvh.node_max[n] - bvh.node_min[n], 0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    def report(name, wide_children, wide_of, leaf_nodes, tri_counts):
        fills = np.array([len(m) for m in wide_children])
        print(f"[{name}] {len(wide_children)} wide rows, "
              f"{len(leaf_nodes)} leaf rows")
        print("  child fill hist (1..8):",
              np.bincount(fills, minlength=9)[1:9].tolist(),
              f"mean {fills.mean():.2f}")
        print("  leaf fill hist (1..14):",
              np.bincount(tri_counts, minlength=15)[1:15].tolist(),
              f"mean {tri_counts.mean():.2f}")
        root_a = area(0)
        root_of = {w: n2 for n2, w in wide_of.items()}
        wide_cost = sum(area(root_of[w]) for w in range(len(wide_children)))
        leaf_cost = sum(area(n) for n in leaf_nodes)
        print(f"  SAH proxy: wide {wide_cost / root_a:.1f} "
              f"+ leaf {leaf_cost / root_a:.1f} "
              f"= {(wide_cost + leaf_cost) / root_a:.1f} "
              f"expected visits/ray")

    t0 = time.time()
    wc, wo, ln, lro = _build_clusters(bvh)
    tg = time.time() - t0
    report(f"greedy {tg:.1f}s", wc, wo, ln,
           np.array([int(bvh.count[n]) for n in ln]))
    t0 = time.time()
    wc, wo, ln, lro, tris, fm = _dp_clusters(bvh)
    td = time.time() - t0
    report(f"dp {td:.1f}s", wc, wo, ln,
           np.array([int(tris[n]) for n in ln]))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 260_000)
