"""Sweep the DP collapse cost constants against the host replay of the
wide kernel (subpacket_sweep.simulate) on the saved arch-260k diffuse wave.

The DP (accel/wide._dp_clusters) minimizes
    sum rows area(row) * C  with C in {C_NODE, C_LEAF};
C_LEAF/C_NODE sets how eagerly subtrees merge into 14-tri leaf rows. The
kernel's real internal-step and leaf-flush costs are NOT equal (a flush
runs the 14-tri MT unroll, an internal step the 8-child box block +
rank/stack machinery; flushes also amortize up to 8 parked rows), so the
optimum ratio is empirical. This sweep replays real sub-packets and
reports simulated visits, which track kernel wall time.

Usage: python experiments/collapse_sweep.py   (needs /tmp/subpacket_wave.npz
from `python experiments/subpacket_sweep.py wave`)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subpacket_sweep import WAVE, simulate  # noqa: E402


def main():
    import loupiote_tpu.accel.wide as wide
    from loupiote_tpu.accel.bvh import build_bvh
    from loupiote_tpu.scene.procedural import build_arch_scene

    scene = build_arch_scene(260_000)
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
    tri9 = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    # BVH leaf order.
    tri9 = tri9[bvh.tri_order]
    print(f"bvh2 {bvh.num_nodes} nodes in {time.time()-t0:.0f}s", flush=True)

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    rng = np.random.default_rng(3)
    cells = rng.choice(len(dro) // 1024, size=4, replace=False)

    def run(tag, **kw):
        old = (wide.C_NODE, wide.C_LEAF)
        wide.C_NODE, wide.C_LEAF = kw.get("cn", 1.0), kw.get("cl", 0.9)
        t0 = time.time()
        w = wide.collapse_wide(bvh, tri9, dp=kw.get("dp", True))
        tb = time.time() - t0
        wide.C_NODE, wide.C_LEAF = old
        rows = np.asarray(w.trav_rows)
        it = lf = pk = 0
        for ci in cells:
            base = ci * 1024
            for p in range(8):
                s = slice(base + p * 128, base + (p + 1) * 128)
                i_, l_ = simulate(rows, w.end_index, dro[s], drd[s],
                                  alive[s])
                it += i_
                lf += l_
                pk += 1
        print(f"[{tag}] rows {w.num_wide}+{w.num_leaf_rows} "
              f"stack {w.stack_need} build {tb:.0f}s | "
              f"int/pkt {it/pk:.1f} leaf/pkt {lf/pk:.1f} "
              f"tot {(it+lf)/pk:.1f}", flush=True)

    run("greedy", dp=False)
    for cl in (0.5, 0.7, 0.9, 1.2, 1.6, 2.2):
        run(f"dp cl={cl}", cl=cl)


if __name__ == "__main__":
    main()
