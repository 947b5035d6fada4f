"""Which inter-bounce sort key minimizes union steps per 128-ray packet?

The union sub-packet kernel's step count IS its cost (latency-bound model,
ROADMAP); the sort key decides which rays share a packet. Replays the
arch-260k diffuse wave re-sorted under key variants and reports
steps/packet on the default w8/cap14 cluster tree (baseline 142.8).

Variants:
  oct_m9   (current)  direction octant (3b, major) | origin morton 9b/axis
  m9_oct              origin morton major | octant minor
  coarse_oct_fine     morton top-3 levels | octant | morton fine levels
  dir6_m8             6-bit direction (octant + dominant-axis sub-code)
                      major | morton 8b/axis
  m9_only             origin morton only (no direction)

Usage: python experiments/sortkey_sim.py [n_cells]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


def spread3(x):
    x = x.astype(np.uint64) & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton3(p, lo, hi, bits=9):
    q = np.clip((p - lo) / np.maximum(hi - lo, 1e-9), 0.0, 1.0)
    qi = (q * ((1 << bits) - 1)).astype(np.uint64)
    return ((spread3(qi[:, 0]) << 2) | (spread3(qi[:, 1]) << 1)
            | spread3(qi[:, 2]))


def octant(d):
    return ((d[:, 0] > 0).astype(np.uint64) * 4
            + (d[:, 1] > 0).astype(np.uint64) * 2
            + (d[:, 2] > 0).astype(np.uint64))


def dir6(d):
    """Octant + dominant-axis code: 0..23 mapped into 5 bits-ish."""
    o = octant(d)
    dom = np.argmax(np.abs(d), axis=1).astype(np.uint64)
    return o * 3 + dom  # 0..23


def keys_variant(name, ro, rd, lo, hi):
    if name == "oct_m9":
        return (octant(rd) << np.uint64(27)) | morton3(ro, lo, hi, 9)
    if name == "m9_oct":
        return (morton3(ro, lo, hi, 9) << np.uint64(3)) | octant(rd)
    if name.startswith("coarse"):
        nb = int(name.split("_")[0][6:])  # coarseN_oct_fine: N top bits
        m = morton3(ro, lo, hi, 9)
        top = m >> np.uint64(27 - nb)
        rest = m & np.uint64((1 << (27 - nb)) - 1)
        return ((top << np.uint64(30 - nb))
                | (octant(rd) << np.uint64(27 - nb)) | rest)
    if name == "dir6_m8":
        return (dir6(rd) << np.uint64(24)) | morton3(ro, lo, hi, 8)
    if name == "m9_only":
        return morton3(ro, lo, hi, 9)
    raise ValueError(name)


def main(n_cells=3):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from leafcap_sim import build_cluster_tree
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
    lo = npk[0, 0:3]
    hi = npk[0, 3:6]

    rng = np.random.default_rng(3)
    R = dro.shape[0]
    # UNIFORM-RANDOM packet sampling is the only unbiased estimator of
    # mean steps/packet: fixed indices correlate with key structure under
    # every deterministic layout (both earlier schemes were biased —
    # random-seed cells landed oct_m9 at 142.8, evenly-spread at 85.5).
    cells = rng.choice(R // 1024, size=n_cells, replace=False)
    import itertools
    trees = {"w16c56": build_cluster_tree(bvh, 16, 56)}
    for tname, name in itertools.product(
            trees, ("oct_m9", "coarse6_oct_fine", "coarse9_oct_fine")):
        nodes, leaves = trees[tname]
        k = keys_variant(name, dro, drd, lo, hi)
        k = np.where(alive, k, np.uint64(1) << np.uint64(63))
        order = np.argsort(k, kind="stable")
        o, d, a = dro[order], drd[order], alive[order]
        costs = []
        for ci in cells:
            base = ci * 1024
            for p in range(8):
                sl = slice(base + p * 128, base + (p + 1) * 128)
                it, lf = simulate(nodes, leaves, tri9, o[sl], d[sl], a[sl])
                costs.append(it + lf)
        costs = np.array(costs, float)
        se = costs.std() / np.sqrt(len(costs))
        print(f"{tname} {name:18s}: steps/pkt {costs.mean():6.1f} "
              f"+- {se:4.1f}  (p50 {np.percentile(costs, 50):5.0f}  "
              f"p90 {np.percentile(costs, 90):5.0f}  n={len(costs)})",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
