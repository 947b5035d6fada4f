"""Do FATTER (multi-row) leaves cut step counts? Width x leaf-cap sweep.

Cost model (ROADMAP round-3 revision): step cost is ~85% dependency-chain
latency — vector ops are nearly free, so a leaf flush that MT-tests 28/42/56
triangles (2-4 consecutive 128-lane rows fetched together, like the 16-ary
node's second row) costs about the same step as a 14-tri flush (+~3% per
doubling by the duplication census). If the SAH DP merges bigger subtrees
into such leaves, both internal AND leaf visits drop.

A visit = one step: internal row = 1, leaf flush = 1 regardless of cap
(the kernel would fetch cap/14 consecutive rows in the same latency
shadow). Reports steps/packet on the saved arch-260k diffuse wave.

Usage: python experiments/leafcap_sim.py [n_cells]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


def build_cluster_tree(bvh, width, leaf_row_cap):
    from loupiote_tpu.accel.wide import _dp_clusters

    wide_children, wide_of, leaf_nodes, leaf_row_of, tris, firstmin = \
        _dp_clusters(bvh, width, leaf_row_cap=leaf_row_cap)
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


def main(n_cells=3):
    import jax

    # Pure host-replay experiment: force CPU in-process (the axon
    # sitecustomize ignores the env var; with the tunnel down, touching
    # the TPU backend raises).
    jax.config.update("jax_platforms", "cpu")
    from width_sim import simulate

    from loupiote_tpu.accel.bvh import FlatBVH
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    scene = build_arch_scene(260_000)
    bufs = build_scene_buffers(scene)
    tri9 = np.asarray(bufs.tri_pack)[:bufs.num_tris, :9]
    npk = np.asarray(bufs.node_pack)[:bufs.num_nodes]
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
        for cap in (14, 28, 42, 56):
            t0 = time.time()
            nodes, leaves = build_cluster_tree(bvh, width, cap)
            bt = time.time() - t0
            tot_i = tot_l = tot_tri = pk = 0
            for ci in cells:
                base = ci * 1024
                for p in range(8):
                    sl = slice(base + p * 128, base + (p + 1) * 128)
                    it, lf = simulate(nodes, leaves, tri9, dro[sl],
                                      drd[sl], alive[sl])
                    tot_i += it
                    tot_l += lf
                    pk += 1
            ntri = sum(c for _, c in leaves)
            print(f"width={width:2d} cap={cap:2d}: rows={len(nodes)}+"
                  f"{len(leaves)} (tris {ntri}, build {bt:.0f}s)  "
                  f"int/pkt {tot_i/pk:6.1f}  leaf/pkt {tot_l/pk:6.1f}  "
                  f"steps/pkt {(tot_i + tot_l)/pk:6.1f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
