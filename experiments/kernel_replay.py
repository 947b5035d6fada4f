"""Step-accurate host replay of the wide kernel's per-row control flow.

Counts the steps a 128-ray sub-packet row burns under each control
scheme, on the saved diffuse wave — predicts kernel step counts without
device time (the device cost model is ~fixed-cost-per-step):

  old     pl.when flush, 1 pend slot (round-2 scheme, approximated)
  base    branchless flush, 1 pend slot, no drain
  drain   branchless flush, 2 pend slots, leaf-draining pops (current)

Usage: python experiments/kernel_replay.py [n_cells]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"
LEAF_TAG = 1 << 30
LEAF_MASK = LEAF_TAG - 1


def mt_leaf(rows, leaf_row, o, d, act, t):
    r = rows[leaf_row]
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
    return t


def replay(rows, o, d, act, oct_bits, scheme):
    n = o.shape[0]
    if not act.any():
        return 0
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d,
                         np.where(d >= 0, 1e-20, -1e-20))
    t = np.full(n, 1e30, np.float32)
    cur = 0  # row index; -1 = END
    stack = []
    pend = []  # parked leaf rows awaiting flush
    slots = 2 if scheme == "drain" else 1
    steps = 0
    while True:
        steps += 1
        if steps > 100000:
            break
        # Flush (branchless: every step; old: when pend full / stalled —
        # approximated as every step too, which only affects t timing).
        for lr in pend:
            t = mt_leaf(rows, lr, o, d, act, t)
        pend = []

        parked = 0
        descend_to = None
        if cur >= 0 and (cur & LEAF_TAG):
            pend.append(cur & LEAF_MASK)
            parked += 1
        elif cur >= 0:
            r = rows[cur]
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
                    hits.append((c ^ oct_bits, int(ptr)))
            hits.sort()
            leaf_hits = [p for _, p in hits if p & LEAF_TAG]
            int_hits = [p for _, p in hits if not (p & LEAF_TAG)]
            # Enqueue the nearest leaf child straight into a pend slot.
            if leaf_hits and parked < slots:
                pend.append(leaf_hits[0] & LEAF_MASK)
                parked += 1
                leaf_hits = leaf_hits[1:]
            if int_hits:
                descend_to = int_hits[0]
            # Push the rest far-to-near (prio order interleaved).
            rest = [p for pr, p in hits
                    if (p in leaf_hits) or (p in int_hits[1:])]
            for p in reversed(rest):
                stack.append(p)
        if descend_to is not None:
            if scheme == "drain2":  # drain the top while descending too
                while stack and (stack[-1] & LEAF_TAG) and parked < slots:
                    pend.append(stack.pop() & LEAF_MASK)
                    parked += 1
            cur = descend_to
            continue
        # Pop phase, with optional leaf draining.
        if scheme in ("drain", "drain2"):
            while stack and (stack[-1] & LEAF_TAG) and parked < slots:
                pend.append(stack.pop() & LEAF_MASK)
                parked += 1
        if stack:
            cur = stack.pop()
        elif pend:
            cur = -1  # retiring; wait one step for the flush
        else:
            break
    return steps


def main(n_cells=3):
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    t0 = time.time()
    bufs = build_scene_buffers(build_arch_scene(260_000))
    rows = np.asarray(bufs.trav_rows)
    print(f"scene {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(3)
    R = dro.shape[0]
    cells = rng.choice(R // 1024, size=n_cells, replace=False)
    for scheme in ("base", "drain", "drain2"):
        tot = pk = 0
        mx = 0
        for ci in cells:
            base = ci * 1024
            for p in range(8):
                sl = slice(base + p * 128, base + (p + 1) * 128)
                d = drd[sl]
                md = (d * alive[sl][:, None]).sum(0)
                ob = int((md[0] < 0) | ((md[1] < 0) << 1)
                         | ((md[2] < 0) << 2))
                st = replay(rows, dro[sl], d, alive[sl], ob, scheme)
                tot += st
                mx = max(mx, st)
                pk += 1
        print(f"{scheme:>6}: steps/row mean {tot/pk:6.1f}  max {mx}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
