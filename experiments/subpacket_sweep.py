"""Sub-packet size sweep on the WIDE tree: how much union redundancy does
shrinking the sub-packet actually remove?

The wide kernel traverses 128-ray sub-packets; ROADMAP measured ~13x union
redundancy on sorted diffuse waves (BVH2 numbers). The lane-group kernel
idea splits each 128-lane row into G independent groups (e.g. 4x32), at a
measurable extra per-step op cost. Whether that wins depends on the
steps(n)-vs-n curve on the REAL tree and wave, which this script measures
by host-replaying the wide kernel's control flow (ordered descent,
per-lane best-t, leaf MT updates) at sub-packet sizes 128/64/32/16/1.

Stage 1 (TPU or CPU, once): build the arch-260k diffuse wave exactly like
experiments/measure_traversal.py and save it to /tmp/subpacket_wave.npz.
Stage 2 (host): simulate and print a table:
    size  internal_steps/packet  leaf_visits/packet  steps_per_ray  factor

Usage:
  python experiments/subpacket_sweep.py wave   # stage 1 (runs on device)
  python experiments/subpacket_sweep.py sim    # stage 2 (pure numpy)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


def stage_wave():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from measure_traversal import build, make_waves

    bufs, cam = build()
    ro, rd, dro, drd, alive = make_waves(bufs, cam)
    import jax.numpy as jnp

    from loupiote_tpu.ops.sort import ray_sort_key, sort_order

    order = sort_order(ray_sort_key(dro, drd, alive, bufs.node_min[0],
                                    bufs.node_max[0]))
    np.savez(WAVE,
             dro=np.asarray(dro[order]), drd=np.asarray(drd[order]),
             alive=np.asarray(alive[order]),
             pro=np.asarray(ro), prd=np.asarray(rd))
    print("saved", WAVE, flush=True)


def simulate(rows, end_index, o, d, act, leaf_cap=14):
    """Host replay of _wide_kernel for one sub-packet of any size.

    Returns (internal_steps, leaf_visits). Leaf rows are visited inline
    (no pend/flush modelling): a leaf visit's MT updates per-lane t, and
    counts as one 'leaf visit' unit.
    """
    n = o.shape[0]
    if not act.any():
        return 0, 0
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d,
                         np.where(d >= 0, 1e-20, -1e-20))
    t = np.full(n, 1e30, np.float32)
    LEAF_TAG = 1 << 30
    LEAF_MASK = LEAF_TAG - 1

    internal = 0
    leaf = 0
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
                p0 = r[b:b + 3]
                e1 = r[b + 3:b + 6]
                e2 = r[b + 6:b + 9]
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
            bmin = r[b:b + 3]
            bmax = r[b + 3:b + 6]
            t1 = (bmin - o) * inv
            t2 = (bmax - o) * inv
            tn = np.minimum(t1, t2).max(1)
            tf = np.maximum(t1, t2).min(1)
            h = (tf >= np.maximum(tn, 0)) & (tn < t) & act
            if h.any():
                hits.append((float(np.where(h, tn, 3e30).min()), int(ptr)))
        hits.sort()
        # Push far-to-near, descend nearest (kernel's ordered descent).
        for tn, ptr in reversed(hits[1:]):
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


def stage_sim():
    from loupiote_tpu.scene.procedural import build_arch_scene
    from loupiote_tpu.scene import build_scene_buffers

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]

    t0 = time.time()
    scene = build_scene_buffers(build_arch_scene(260_000))
    rows = np.asarray(scene.trav_rows)
    end_index = int(scene.wide_end)
    print(f"scene built in {time.time() - t0:.0f}s; rows {rows.shape}",
          flush=True)

    rng = np.random.default_rng(3)
    R = dro.shape[0]
    n_cells = 4
    cells = rng.choice(R // 1024, size=n_cells, replace=False)
    sizes = [128, 64, 32, 16, 1]
    res = {s: [0, 0, 0] for s in sizes}  # internal, leaf, packets
    for ci in cells:
        base = ci * 1024
        o = dro[base:base + 1024]
        d = drd[base:base + 1024]
        a = alive[base:base + 1024]
        for s in sizes:
            if s == 1:
                # Sample 32 single rays per cell (full 1024 too slow).
                for ri in rng.choice(1024, size=32, replace=False):
                    if not a[ri]:
                        continue
                    it, lf = simulate(rows, end_index, o[ri:ri + 1],
                                      d[ri:ri + 1], a[ri:ri + 1])
                    res[s][0] += it
                    res[s][1] += lf
                    res[s][2] += 1
            else:
                for p in range(1024 // s):
                    it, lf = simulate(rows, end_index,
                                      o[p * s:(p + 1) * s],
                                      d[p * s:(p + 1) * s],
                                      a[p * s:(p + 1) * s])
                    res[s][0] += it
                    res[s][1] += lf
                    res[s][2] += 1
    print(f"{'size':>5} {'int/pkt':>9} {'leaf/pkt':>9} {'visits/ray':>11} "
          f"{'vs128':>6}")
    base_per_ray = None
    for s in sizes:
        it, lf, pk = res[s]
        ipp = it / pk
        lpp = lf / pk
        per_ray = (ipp + lpp) / (s if s > 1 else 1)
        if base_per_ray is None:
            base_per_ray = per_ray
        print(f"{s:>5} {ipp:>9.1f} {lpp:>9.1f} {per_ray:>11.2f} "
              f"{base_per_ray / per_ray:>6.2f}")


if __name__ == "__main__":
    if sys.argv[1:] == ["wave"]:
        stage_wave()
    else:
        stage_sim()
