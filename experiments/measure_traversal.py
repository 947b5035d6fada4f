"""Round-2 perf evidence: where does the 45x gap live?

Measures on the arch-260k scene at 1080p:
  1. On-TPU per-wave ms: primary closest-hit, diffuse closest-hit
     (unsorted + morton-sorted), shadow any-hit.
  2. Host simulation of the sub-packet traversal: union step counts and
     leaf-step fractions per 128-ray sub-packet, vs per-single-ray node
     visits (the per-lane lower bound).
  3. jnp.argsort cost at 2M keys (the binning primitive's price).

Run: python experiments/measure_traversal.py [--sim-only|--tpu-only]
"""

import os
import sys
import time

import numpy as np

# Setting PYTHONPATH breaks axon plugin discovery; self-path instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    scene = build_arch_scene(260_000)
    bufs = build_scene_buffers(scene)
    cam = np.asarray(arch_camera())
    return bufs, cam


def make_waves(bufs, cam, W=1920, H=1080, seed=0):
    """Returns (primary ro/rd, diffuse ro/rd) in tile order (numpy)."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.ops.pallas_intersect import intersect_pallas
    from loupiote_tpu.ops.raygen import generate_rays
    from loupiote_tpu.render.integrator import to_tile_order

    jitter = jr.uniform(jr.PRNGKey(seed), (W * H, 2))
    ro, rd = generate_rays(jnp.asarray(cam), W, H, 0.785, jitter)
    ro = to_tile_order(ro, W, H)
    rd = to_tile_order(rd, W, H)
    hit = jax.jit(lambda a, b: intersect_pallas(bufs, a, b))(ro, rd)
    jax.block_until_ready(hit.t)

    # Diffuse continuation wave: cosine sample around geometric normal.
    tri = jnp.maximum(hit.tri, 0)
    gn = bufs.tri_shade[tri, 17:20]
    d = jnp.sum(gn * rd, axis=1, keepdims=True)
    gn = jnp.where(d > 0, -gn, gn)  # face forward
    pos = ro + hit.t[:, None] * rd + gn * 1e-3
    u = jr.uniform(jr.PRNGKey(seed + 1), (W * H, 2))
    from loupiote_tpu.ops.sampling import (cosine_sample_hemisphere,
                                           orthonormal_basis, to_world)

    local = cosine_sample_hemisphere(u[:, 0], u[:, 1])
    t_, bt = orthonormal_basis(gn)
    nd = to_world(gn, t_, bt, local)
    alive = hit.tri >= 0
    return (np.asarray(ro), np.asarray(rd), np.asarray(pos), np.asarray(nd),
            np.asarray(alive))


def tpu_timings(bufs, ro, rd, dro, drd, alive):
    import jax
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_intersect import (intersect_pallas,
                                                   occluded_pallas)
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order

    R = ro.shape[0]
    res = {}

    def timeit(fn, *args, n=4):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return best

    f = jax.jit(lambda a, b, act: intersect_pallas(bufs, a, b, active=act))
    ones = jnp.ones(R, bool)
    res["primary_ms"] = timeit(f, jnp.asarray(ro), jnp.asarray(rd), ones) * 1e3
    res["diffuse_unsorted_ms"] = timeit(
        f, jnp.asarray(dro), jnp.asarray(drd), jnp.asarray(alive)) * 1e3

    lo, hi = bufs.node_min[0], bufs.node_max[0]
    key = ray_sort_key(jnp.asarray(dro), jnp.asarray(drd),
                       jnp.asarray(alive), lo, hi)
    order = np.asarray(sort_order(key))
    res["diffuse_sorted_ms"] = timeit(
        f, jnp.asarray(dro[order]), jnp.asarray(drd[order]),
        jnp.asarray(alive[order])) * 1e3

    g = jax.jit(lambda a, b, t0, act: occluded_pallas(bufs, a, b, t0,
                                                      active=act))
    tmax = jnp.full(R, 30.0)
    res["shadow_sorted_ms"] = timeit(
        g, jnp.asarray(dro[order]), jnp.asarray(drd[order]), tmax,
        jnp.asarray(alive[order])) * 1e3

    srt = jax.jit(lambda k: jnp.argsort(k))
    res["argsort_2M_ms"] = timeit(srt, key) * 1e3
    kf = jax.jit(lambda a, b, act: ray_sort_key(a, b, act, lo, hi))
    res["sortkey_ms"] = timeit(kf, jnp.asarray(dro), jnp.asarray(drd),
                               jnp.asarray(alive)) * 1e3
    # Full gather of packed rays by order (the other half of binning cost).
    def permute(a, b, act, o):
        packed = jnp.concatenate(
            [a, b, act.astype(jnp.float32)[:, None]], axis=1)
        return packed[o]
    res["permute_ms"] = timeit(jax.jit(permute), jnp.asarray(dro),
                               jnp.asarray(drd), jnp.asarray(alive),
                               jnp.asarray(order)) * 1e3
    return res


def simulate_unions(bufs, ro, rd, alive, n_cells=6, seed=3):
    """Host replay of the kernel's per-sub-packet control flow.

    Returns dict with union steps / leaf-step fraction per sub-packet and
    per-single-ray visit counts.
    """
    nm = np.asarray(bufs.node_min)
    nx = np.asarray(bufs.node_max)
    first = np.asarray(bufs.node_first)
    count = np.asarray(bufs.node_count)
    right_ax = np.asarray(bufs.node_rows[:, 8:10]).view(np.int32)
    right = right_ax[:, 0]  # leaf_row for leaves, right child otherwise
    axis = right_ax[:, 1]  # global first for leaves, split axis otherwise
    p0 = np.asarray(bufs.tri_p0)
    e1 = np.asarray(bufs.tri_e1)
    e2 = np.asarray(bufs.tri_e2)
    N = int(bufs.num_nodes)

    rng = np.random.default_rng(seed)
    R = ro.shape[0]
    TILE = 1024
    cells = rng.choice(R // TILE, size=n_cells, replace=False)

    def trace_subpacket(o, d, act):
        """Replicates _traverse_kernel for one sub-packet; returns
        (steps, leaf_steps, per-ray ideal visits)."""
        n_rays = o.shape[0]
        inv = 1.0 / np.where(np.abs(d) > 1e-20, d,
                             np.where(d >= 0, 1e-20, -1e-20))
        dpos = np.sign(d).sum(0) >= 0  # majority per axis
        t = np.full(n_rays, 1e30, np.float32)
        node, stack, steps, lsteps = 0, [], 0, 0
        while True:
            steps += 1
            bmin, bmax = nm[node], nx[node]
            t1 = (bmin - o) * inv
            t2 = (bmax - o) * inv
            tn = np.minimum(t1, t2).max(1)
            tf = np.maximum(t1, t2).min(1)
            hit = (tf >= np.maximum(tn, 0)) & (tn < t) & act
            c = count[node]
            if hit.any() and c > 0:
                lsteps += 1
                f = first[node]
                for k in range(c):
                    tt, ok = _mt(o, d, p0[f + k], e1[f + k], e2[f + k])
                    upd = ok & hit & (tt < t) & (tt > 1e-4)
                    t = np.where(upd, tt, t)
            if hit.any() and c == 0:
                ax = axis[node]
                near, far = ((node + 1, right[node]) if dpos[ax]
                             else (right[node], node + 1))
                stack.append(far)
                node = near
            else:
                if not stack:
                    break
                node = stack.pop()
            if steps > 400_000:
                break
        return steps, lsteps

    def _mt(o, d, P0, E1, E2):
        pv = np.cross(d, E2)
        det = (E1 * pv).sum(1)
        invd = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
        tv = o - P0
        uu = (tv * pv).sum(1) * invd
        qv = np.cross(tv, E1)
        vv = (d * qv).sum(1) * invd
        tt = (E2 * qv).sum(1) * invd
        ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (invd != 0)
        return tt.astype(np.float32), ok

    out = {"sub128_steps": [], "sub128_leaf_frac": [], "ray_visits": []}
    for ci in cells:
        base = ci * TILE
        block_o = ro[base:base + TILE].reshape(8, 128, 3)
        block_d = rd[base:base + TILE].reshape(8, 128, 3)
        block_a = alive[base:base + TILE].reshape(8, 128)
        for s in range(8):
            st, ls = trace_subpacket(block_o[s], block_d[s], block_a[s])
            out["sub128_steps"].append(st)
            out["sub128_leaf_frac"].append(ls / max(st, 1))
        # Per-lane ideal: single-ray visits for 32 random rays of the cell.
        for ri in rng.choice(TILE, size=16, replace=False):
            if not alive[base + ri]:
                continue
            st, _ = trace_subpacket(block_o.reshape(-1, 3)[ri:ri + 1],
                                    block_d.reshape(-1, 3)[ri:ri + 1],
                                    np.ones((1,), bool))
            out["ray_visits"].append(st)
    return {k: (float(np.mean(v)), float(np.max(v)) if v else 0)
            for k, v in out.items()}


def bin_oracle(bufs, dro, drd, alive):
    """Upper bound for traversal-aware binning: sort the diffuse wave by its
    ACTUAL first-hit triangle id (tris are BVH-leaf-ordered => perfect
    spatial key), then re-measure sub-packet unions and on-TPU time."""
    import jax
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_intersect import intersect_pallas
    from loupiote_tpu.ops.sort import direction_octant

    hit = jax.jit(lambda a, b, act: intersect_pallas(bufs, a, b, active=act))(
        jnp.asarray(dro), jnp.asarray(drd), jnp.asarray(alive))
    tri = np.asarray(hit.tri)
    octant = np.asarray(direction_octant(jnp.asarray(drd)))
    # Dead/missed rays last; key: hit tri (spatial) then octant.
    key = np.where(alive & (tri >= 0),
                   (tri.astype(np.uint64) << np.uint64(3)) | octant,
                   np.uint64(1) << np.uint64(60))
    order = np.argsort(key, kind="stable")
    print("bin oracle (sort by first-hit tri):",
          simulate_unions(bufs, dro[order], drd[order], alive[order]),
          flush=True)

    import time as _t
    f = jax.jit(lambda a, b, act: intersect_pallas(bufs, a, b, active=act))
    args = (jnp.asarray(dro[order]), jnp.asarray(drd[order]),
            jnp.asarray(alive[order]))
    out = f(*args)
    jax.block_until_ready(out.t)
    best = float("inf")
    for _ in range(3):
        t0 = _t.time()
        out = f(*args)
        jax.block_until_ready(out.t)
        best = min(best, _t.time() - t0)
    print(f"bin-oracle diffuse ms: {best*1e3:.0f}", flush=True)


def wide_timings(bufs, ro, rd, dro, drd, alive):
    import jax
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_wide import intersect_wide, occluded_wide
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order

    R = ro.shape[0]

    def timeit(fn, *args, n=4):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return best

    f = jax.jit(lambda a, b, act: intersect_wide(bufs, a, b, active=act))
    ones = jnp.ones(R, bool)
    res = {}
    res["wide_primary_ms"] = timeit(f, jnp.asarray(ro), jnp.asarray(rd),
                                    ones) * 1e3
    lo, hi = bufs.node_min[0], bufs.node_max[0]
    key = ray_sort_key(jnp.asarray(dro), jnp.asarray(drd),
                       jnp.asarray(alive), lo, hi)
    order = np.asarray(sort_order(key))
    res["wide_diffuse_sorted_ms"] = timeit(
        f, jnp.asarray(dro[order]), jnp.asarray(drd[order]),
        jnp.asarray(alive[order])) * 1e3
    g = jax.jit(lambda a, b, t0, act: occluded_wide(bufs, a, b, t0,
                                                    active=act))
    res["wide_shadow_sorted_ms"] = timeit(
        g, jnp.asarray(dro[order]), jnp.asarray(drd[order]),
        jnp.full(R, 30.0), jnp.asarray(alive[order])) * 1e3
    # Correctness spot check vs the BVH2 kernel on-device.
    from loupiote_tpu.ops.pallas_intersect import intersect_pallas
    h2 = jax.jit(lambda a, b: intersect_pallas(bufs, a, b))(
        jnp.asarray(ro), jnp.asarray(rd))
    hw = f(jnp.asarray(ro), jnp.asarray(rd), ones)
    agree = float((np.asarray(h2.tri) == np.asarray(hw.tri)).mean())
    res["wide_vs_bvh2_tri_agree"] = agree
    res["wide_t_maxdiff"] = float(
        np.abs(np.asarray(h2.t) - np.asarray(hw.t)).max())
    return res


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    bufs, cam = build()
    print("scene: nodes=%d tris=%d leaf_cap=%d stack=%d" %
          (bufs.num_nodes, bufs.num_tris, bufs.leaf_cap, bufs.stack_depth),
          flush=True)
    ro, rd, dro, drd, alive = make_waves(bufs, cam)
    print("alive frac after bounce0: %.3f" % alive.mean(), flush=True)
    if mode in ("all", "--tpu-only"):
        res = tpu_timings(bufs, ro, rd, dro, drd, alive)
        for k, v in res.items():
            print(f"{k}: {v:.1f}")
        R = ro.shape[0]
        print("primary Mrays/s: %.1f" % (R / res["primary_ms"] / 1e3))
        print("diffuse sorted Mrays/s: %.1f" %
              (R / res["diffuse_sorted_ms"] / 1e3))
        print("shadow sorted Mrays/s: %.1f" %
              (R / res["shadow_sorted_ms"] / 1e3), flush=True)
    if mode == "--wide":
        res = wide_timings(bufs, ro, rd, dro, drd, alive)
        for k, v in res.items():
            print(f"{k}: {v:.3f}")
        R = len(ro)
        print("wide primary Mrays/s: %.1f" % (R / res["wide_primary_ms"] / 1e3))
        print("wide diffuse Mrays/s: %.1f" %
              (R / res["wide_diffuse_sorted_ms"] / 1e3), flush=True)
    if mode == "--compaction":
        # Wavefront compaction evidence (VERDICT r1 item 4): dead rays sort
        # to the tail (DEAD_KEY) into all-dead tiles that retire on their
        # first kernel step, so traced cost tracks the alive fraction.
        import jax
        import jax.numpy as jnp

        from loupiote_tpu.ops.pallas_wide import intersect_wide
        from loupiote_tpu.ops.sort import ray_sort_key, sort_order

        R = len(dro)
        lo, hi = bufs.node_min[0], bufs.node_max[0]
        f = jax.jit(lambda a, b, act: intersect_wide(bufs, a, b, active=act))

        def timed(o, d, a):
            out = f(jnp.asarray(o), jnp.asarray(d), jnp.asarray(a))
            jax.block_until_ready(out.t)
            best = float("inf")
            for i in range(3):
                oo = o + np.float32(i + 1) * 1e-6  # fresh inputs
                t0 = time.time()
                out = f(jnp.asarray(oo), jnp.asarray(d), jnp.asarray(a))
                jax.block_until_ready(out.t)
                best = min(best, time.time() - t0)
            return best * 1e3

        rng = np.random.default_rng(5)
        for frac in (1.0, 0.5, 0.25):
            al = alive & (rng.random(R) < frac)
            key = ray_sort_key(jnp.asarray(dro), jnp.asarray(drd),
                               jnp.asarray(al), lo, hi)
            order = np.asarray(sort_order(key))
            ms = timed(dro[order], drd[order], al[order])
            print(f"alive_frac={frac:.2f}: sorted diffuse {ms:.0f} ms",
                  flush=True)
    if mode == "--bin-oracle":
        bin_oracle(bufs, dro, drd, alive)
    if mode in ("all", "--sim-only"):
        print("union sim (primary):", simulate_unions(bufs, ro, rd,
                                                      np.ones(len(ro), bool)))
        print("union sim (diffuse unsorted):",
              simulate_unions(bufs, dro, drd, alive))
        from loupiote_tpu.ops.sort import ray_sort_key, sort_order
        import jax.numpy as jnp
        key = ray_sort_key(jnp.asarray(dro), jnp.asarray(drd),
                           jnp.asarray(alive), bufs.node_min[0],
                           bufs.node_max[0])
        order = np.asarray(sort_order(key))
        print("union sim (diffuse sorted):",
              simulate_unions(bufs, dro[order], drd[order], alive[order]))
