"""Does spp-batching tighten sub-packets? (host replay, no TPU needed)

Hypothesis: tracing S samples/pixel in ONE wave makes the sorted 128-ray
slabs cover a tighter region of ray space (S rays share each primary hit
point on diffuse bounces; origins duplicate, directions densify), so the
union traversal does fewer steps PER RAY — a throughput lever that needs
no kernel change, just a batched integrator wave.

Method: build the arch-260k tree, trace primaries with the XLA oracle at
a reduced resolution (CPU-affordable), generate the bounce-1 diffuse
wave at spp in {1,2,4} (independent jitter + cosine samples per sample),
sort each wave with the production key, and PAIRED-replay K aligned
128-ray slabs per wave (subpacket_sweep.simulate). Report steps/packet —
rays/packet is 128 for all, so the ratio IS the per-ray cost ratio.

Usage: python experiments/spp_sim.py [W H K]   (defaults 640 360 192)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from subpacket_sweep import simulate  # noqa: E402


def diffuse_wave(bufs, cam, W, H, spp, seed=0):
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.ops.intersect import intersect_rays
    from loupiote_tpu.ops.raygen import generate_rays
    from loupiote_tpu.ops.sampling import (cosine_sample_hemisphere,
                                           orthonormal_basis, to_world)
    from loupiote_tpu.render.integrator import to_tile_order

    ros, rds, alives = [], [], []
    f = jax.jit(lambda a, b: intersect_rays(bufs, a, b))
    for s in range(spp):
        jitter = jr.uniform(jr.PRNGKey(seed + 101 * s), (W * H, 2))
        ro, rd = generate_rays(jnp.asarray(cam), W, H, 0.785, jitter)
        ro = to_tile_order(ro, W, H)
        rd = to_tile_order(rd, W, H)
        hit = f(ro, rd)
        tri = jnp.maximum(hit.tri, 0)
        gn = bufs.tri_shade[tri, 17:20]
        dd = jnp.sum(gn * rd, axis=1, keepdims=True)
        gn = jnp.where(dd > 0, -gn, gn)
        pos = ro + hit.t[:, None] * rd + gn * 1e-3
        u = jr.uniform(jr.PRNGKey(seed + 101 * s + 7), (W * H, 2))
        local = cosine_sample_hemisphere(u[:, 0], u[:, 1])
        t_, bt = orthonormal_basis(gn)
        nd = to_world(gn, t_, bt, local)
        ros.append(np.asarray(pos))
        rds.append(np.asarray(nd))
        alives.append(np.asarray(hit.tri >= 0))
    return (np.concatenate(ros), np.concatenate(rds),
            np.concatenate(alives))


def main(W=640, H=360, K=192):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from loupiote_tpu.ops.sort import ray_sort_key, sort_order
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    bufs = build_scene_buffers(build_arch_scene(260_000))
    cam = np.asarray(arch_camera())
    rows = np.asarray(bufs.trav_rows)
    end = int(bufs.wide_end)
    lo = np.asarray(bufs.node_min[0])
    hi = np.asarray(bufs.node_max[0])

    rng = np.random.default_rng(3)
    base = None
    for spp in (1, 2, 4):
        t0 = time.time()
        ro, rd, alive = diffuse_wave(bufs, cam, W, H, spp)
        key = ray_sort_key(jnp.asarray(ro), jnp.asarray(rd),
                           jnp.asarray(alive), jnp.asarray(lo),
                           jnp.asarray(hi))
        order = np.asarray(sort_order(key))
        ro, rd, alive = ro[order], rd[order], alive[order]
        n_pack = len(ro) // 128
        # Paired sampling: fixed fractional positions across spp levels so
        # each level replays the same quantiles of the sorted wave
        # (unpaired fixed-index sampling is badly biased, sortkey_sim.py).
        fracs = rng.random(K)
        packs = np.unique((fracs * n_pack).astype(int))
        tot_i = tot_l = 0
        for p in packs:
            s = slice(p * 128, (p + 1) * 128)
            i, l = simulate(rows, end, ro[s], rd[s], alive[s])
            tot_i += i
            tot_l += l
        steps = (tot_i + tot_l) / len(packs)
        ratio = steps / base if base else 1.0
        if base is None:
            base = steps
        print(f"spp={spp}: {steps:7.1f} steps/packet "
              f"(int {tot_i / len(packs):.1f} leaf {tot_l / len(packs):.1f})"
              f"  per-ray ratio vs spp=1: {ratio:.3f}   "
              f"[{len(packs)} packets, {time.time() - t0:.0f}s]",
              flush=True)
        rng = np.random.default_rng(3)  # same fracs each level


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a[:3])) if a else main()
