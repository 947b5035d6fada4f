"""A/B the descent ORDER policy on the real wide tree (host replay).

Separates two explanations for the octant-descent device regression:
bad ordering (visits explode in the sim too) vs a kernel bug (sim fine,
device slow). Policies:
  tnear   exact per-packet union-tnear order (what the kernel did before)
  octant  slot ^ octant(mean dir) priority (what the kernel does now;
          children were placed at octant slots by accel/wide.py)
  index   no ordering (visit in slot order) — the floor

Usage: python experiments/order_sim.py [n_cells]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"
LEAF_MASK = (1 << 30) - 1


def simulate(rows, o, d, act, policy):
    n = o.shape[0]
    if not act.any():
        return 0, 0
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d,
                         np.where(d >= 0, 1e-20, -1e-20))
    t = np.full(n, 1e30, np.float32)
    md = (d * act[:, None]).sum(0)
    oct_bits = (md[0] < 0) | ((md[1] < 0) << 1) | ((md[2] < 0) << 2)

    internal = leaf = 0
    stack = []
    node = 0
    while True:
        r = rows[node]
        kind = r[127:128].view(np.int32)[0]
        if kind == 1:
            leaf += 1
            fc = r[126:127].view(np.int32)[0]
            cnt = fc & 15
            for k in range(cnt):
                b = 9 * k
                p0, e1, e2 = r[b:b + 3], r[b + 3:b + 6], r[b + 6:b + 9]
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
            if not stack:
                break
            node = stack.pop()
            continue
        internal += 1
        hits = []
        for c in range(8):
            b = 16 * c
            ptr = r[b + 6:b + 7].view(np.int32)[0]
            if ptr == -1:
                continue
            bmin, bmax = r[b:b + 3], r[b + 3:b + 6]
            t1 = (bmin - o) * inv
            t2 = (bmax - o) * inv
            tn = np.minimum(t1, t2).max(1)
            tf = np.maximum(t1, t2).min(1)
            h = (tf >= np.maximum(tn, 0)) & (tn < t) & act
            if h.any():
                if policy == "tnear":
                    key = float(np.where(h, tn, 3e30).min())
                elif policy == "octant":
                    key = c ^ oct_bits
                else:
                    key = c
                hits.append((key, int(ptr)))
        hits.sort()
        for _, ptr in reversed(hits[1:]):
            stack.append(ptr & LEAF_MASK)
        if hits:
            node = hits[0][1] & LEAF_MASK
        elif stack:
            node = stack.pop()
        else:
            break
        if internal > 400_000:
            break
    return internal, leaf


def main(n_cells=4):
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    t0 = time.time()
    scene = build_scene_buffers(build_arch_scene(260_000))
    rows = np.asarray(scene.trav_rows)
    print(f"scene built in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(3)
    R = dro.shape[0]
    cells = rng.choice(R // 1024, size=n_cells, replace=False)
    for policy in ("tnear", "octant", "index"):
        tot_i = tot_l = pk = 0
        for ci in cells:
            base = ci * 1024
            for p in range(8):
                s = 128
                sl = slice(base + p * s, base + (p + 1) * s)
                it, lf = simulate(rows, dro[sl], drd[sl], alive[sl], policy)
                tot_i += it
                tot_l += lf
                pk += 1
        print(f"{policy:>7}: int/pkt {tot_i/pk:7.1f}  leaf/pkt "
              f"{tot_l/pk:7.1f}  tot {(tot_i+tot_l)/pk:7.1f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
