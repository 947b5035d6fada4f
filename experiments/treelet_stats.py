"""Host-side stats for the treelet pipeline design (no TPU needed).

Reports, on a sampled arch-260k diffuse wave:
  - subtree count / entry-fill distribution for the ENTRY_CAP partition
  - pendings per ray (phase-2 pair count), bounded and unbounded t
  - distinct-subtree count per 1024-pair window in ray order (the no-sort
    scheme's efficiency factor) vs sorted binning padding waste

Run: python experiments/treelet_stats.py [sample_rays]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "")


def main(sample=40_000):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from measure_traversal import build

    from loupiote_tpu.accel.bvh import FlatBVH
    from experiments.treelet.build import build_treelet_tables
    from experiments.treelet.lane_top import ID_BITS as TOP_ID_BITS
    from experiments.treelet.lane_top import ID_MASK

    t0 = time.time()
    bufs, cam = build()
    npk = np.asarray(bufs.node_pack)[:bufs.num_nodes]
    bvh = FlatBVH(
        node_min=npk[:, 0:3].copy(), node_max=npk[:, 3:6].copy(),
        first=npk[:, 6].view(np.int32).copy(),
        count=npk[:, 7].view(np.int32).copy(),
        miss=npk[:, 8].view(np.int32).copy(),
        right=npk[:, 9].view(np.int32).copy(),
        axis=npk[:, 10].view(np.int32).copy(),
        tri_order=np.arange(bufs.num_tris, dtype=np.int32))
    print(f"scene ready {time.time()-t0:.1f}s, nodes={bvh.num_nodes}",
          flush=True)

    t0 = time.time()
    tables = build_treelet_tables(bvh)
    print(f"partition: {tables.num_subtrees} subtrees, top={tables.num_top} "
          f"entries ({tables.top_tiles} tiles), build {time.time()-t0:.1f}s",
          flush=True)
    ent = tables.sub_entries
    print(f"subtree entries: mean {ent.mean():.0f}, median "
          f"{np.median(ent):.0f}, p10 {np.percentile(ent,10):.0f}, "
          f"fill {ent.mean()/1024*100:.0f}%", flush=True)

    # Small diffuse wave on the CPU backend (XLA packet kernel).
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.ops.intersect import intersect_packets
    from loupiote_tpu.ops.raygen import generate_rays
    from loupiote_tpu.ops.sampling import (cosine_sample_hemisphere,
                                           orthonormal_basis, to_world)
    from loupiote_tpu.render.integrator import to_tile_order

    W, H = 896, 512
    pro, prd = generate_rays(jnp.asarray(cam), W, H, 0.785,
                             jr.uniform(jr.PRNGKey(0), (W * H, 2)))
    pro = to_tile_order(pro, W, H)
    prd = to_tile_order(prd, W, H)
    hit = jax.jit(lambda a, b: intersect_packets(bufs, a, b))(pro, prd)
    tri = jnp.maximum(hit.tri, 0)
    gn = bufs.tri_shade[tri, 17:20]
    gn = jnp.where((jnp.sum(gn * prd, axis=1) > 0)[:, None], -gn, gn)
    pos = pro + hit.t[:, None] * prd + gn * 1e-3
    u = jr.uniform(jr.PRNGKey(1), (W * H, 2))
    tb, bt = orthonormal_basis(gn)
    nd = to_world(gn, tb, bt, cosine_sample_hemisphere(u[:, 0], u[:, 1]))
    dro, drd = np.asarray(pos), np.asarray(nd)
    alive = np.asarray(hit.tri >= 0)
    print(f"wave ready ({alive.mean()*100:.0f}% alive)", flush=True)

    from loupiote_tpu.ops.sort import ray_sort_key, sort_order

    order = np.asarray(sort_order(ray_sort_key(
        jnp.asarray(dro), jnp.asarray(drd), jnp.asarray(alive),
        bufs.node_min[0], bufs.node_max[0])))
    dro, drd, alive = dro[order], drd[order], alive[order]
    # CONTIGUOUS sample (window stats need real neighbor locality).
    start = (len(dro) - sample) // 2
    idx = np.arange(start, start + sample)
    ro, rd, al = dro[idx], drd[idx], alive[idx]

    f = tables.top_fields.reshape(8, -1)
    K = tables.num_top
    bmin = f[0:3, :K].T
    bmax = f[3:6, :K].T
    link = f[6, :K].view(np.int32)
    pend = f[7, :K].view(np.int32)
    hit_id = link & ID_MASK
    miss_id = (link >> TOP_ID_BITS) & ID_MASK

    for label, tbound in (("t<=30", 30.0), ("unbounded", 1e30)):
        R = len(ro)
        inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                             np.where(rd >= 0, 1e-20, -1e-20))
        cur = np.where(al, 0, ID_MASK).astype(np.int64)
        pends = [[] for _ in range(R)]
        steps = 0
        while (cur != ID_MASK).any() and steps < 4 * K + 64:
            steps += 1
            live = cur != ID_MASK
            c = np.where(live, cur, 0)
            t1 = (bmin[c] - ro) * inv
            t2 = (bmax[c] - ro) * inv
            tn = np.max(np.minimum(t1, t2), axis=1)
            tf = np.min(np.maximum(t1, t2), axis=1)
            hit = (tf >= np.maximum(tn, 0.0)) & (tn < tbound) & live
            enq = hit & (pend[c] >= 0)
            for i in np.nonzero(enq)[0]:
                pends[i].append(pend[c[i]])
            descend = hit & (hit_id[c] != ID_MASK)
            cur = np.where(descend, hit_id[c], miss_id[c])
            cur = np.where(live, cur, ID_MASK)
        np_ = np.array([len(p) for p in pends])
        anp = np_[al]
        print(f"[{label}] pend/ray mean {anp.mean():.2f} p50 "
              f"{np.median(anp):.0f} p95 {np.percentile(anp,95):.0f} "
              f"p99 {np.percentile(anp,99):.0f} max {anp.max()} "
              f"frac>4 {(anp>4).mean()*100:.2f}% "
              f"frac>8 {(anp>8).mean()*100:.2f}%", flush=True)

        # Distinct subtrees per 1024-pair window in ray order (no-sort
        # scheme) + padding waste for the sorted scheme.
        flat = [t for p in pends for t in p]
        U = []
        for w in range(0, len(flat) - 1024, 1024):
            U.append(len(set(flat[w:w + 1024])))
        if U:
            print(f"[{label}] distinct subtrees per 1024-pair window: "
                  f"mean {np.mean(U):.1f} p90 {np.percentile(U,90):.0f}",
                  flush=True)
        counts = np.bincount(flat, minlength=tables.num_subtrees)
        padded = (-(-counts // 1024) * 1024)[counts > 0].sum()
        print(f"[{label}] sorted-binning: {len(flat)} pairs -> {padded} "
              f"padded slots (x{padded/max(len(flat),1):.2f})", flush=True)

    # Phase-2 walk-length distribution (lockstep cost driver): walk each
    # sampled pair with the reference walker; report per-pair steps and the
    # max/mean ratio over sorted 1024-pair blocks.
    from experiments.treelet.build import walk_subtree_ref

    rs, ss, ls = [], [], []
    take = min(len(pends), 6000)
    for i in range(take):
        if not al[i]:
            continue
        for t in pends[i]:
            rs.append(i)
            ss.append(t)
    pair_t = np.array(ss)
    pair_r = np.array(rs)
    po = np.argsort(pair_t, kind="stable")
    steps = np.empty(len(po), np.int64)
    for j, p in enumerate(po):
        _, _, st = walk_subtree_ref(tables, int(pair_t[p]), ro[pair_r[p]],
                                    rd[pair_r[p]], 1e30, return_steps=True)
        steps[j] = st
    print(f"walk steps/pair: mean {steps.mean():.0f} p50 "
          f"{np.median(steps):.0f} p95 {np.percentile(steps,95):.0f} "
          f"p99 {np.percentile(steps,99):.0f} max {steps.max()}", flush=True)
    blocks = [steps[w:w + 1024] for w in range(0, len(steps) - 1024, 1024)]
    if blocks:
        eff = [b.max() / max(b.mean(), 1) for b in blocks]
        print(f"lockstep (sorted blocks): mean(max/mean) {np.mean(eff):.2f} "
              f"block max mean {np.mean([b.max() for b in blocks]):.0f}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40_000)
