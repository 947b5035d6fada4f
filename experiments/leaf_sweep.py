"""Leaf-fill sweep for the wide kernel (VERDICT r2 item 7): smaller BVH2
leaves shrink the unrolled flush block (leaf_cap) at the cost of more leaf
rows / deeper trees. Interleaved timing across variants per round so the
tunnel pool's drift cancels.

Run: python experiments/leaf_sweep.py [leaf_max ...]  (default 14 10 8)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(caps):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from measure_traversal import make_waves

    from loupiote_tpu.ops.pallas_wide import intersect_wide, occluded_wide
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    scene = build_arch_scene(260_000)
    cam = np.asarray(arch_camera())
    variants = {}
    for cap in caps:
        bufs = build_scene_buffers(scene, leaf_max=cap, treelets=False)
        variants[cap] = bufs
        print(f"leaf_max={cap}: leaf_cap={bufs.leaf_cap} "
              f"wide_end={bufs.wide_end}", flush=True)

    bufs0 = variants[caps[0]]
    ro, rd, dro, drd, alive = make_waves(bufs0, cam)
    order = np.asarray(sort_order(ray_sort_key(
        jnp.asarray(dro), jnp.asarray(drd), jnp.asarray(alive),
        bufs0.node_min[0], bufs0.node_max[0])))
    dro, drd, alive = dro[order], drd[order], alive[order]
    R = len(dro)
    dist = np.full(R, 30.0, np.float32)

    diff = jax.jit(lambda b, a, d, al: intersect_wide(b, a, d,
                                                      active=al).t)
    shad = jax.jit(lambda b, a, d, t, al: occluded_wide(b, a, d, t,
                                                        active=al))
    best = {(c, w): float("inf") for c in caps for w in ("diff", "shad")}
    for i in range(6):
        a = jnp.asarray(dro + np.float32(i) * 1e-6)
        d = jnp.asarray(drd)
        t = jnp.asarray(dist)
        al = jnp.asarray(alive)
        for cap in caps:
            b = variants[cap]
            t0 = time.time()
            jax.block_until_ready(diff(b, a, d, al))
            dt1 = time.time() - t0
            t0 = time.time()
            jax.block_until_ready(shad(b, a, d, t, al))
            dt2 = time.time() - t0
            if i == 0:
                print(f"cap {cap}: compile+first diff {dt1:.1f}s "
                      f"shad {dt2:.1f}s", flush=True)
            else:
                best[(cap, "diff")] = min(best[(cap, "diff")], dt1)
                best[(cap, "shad")] = min(best[(cap, "shad")], dt2)
                print(f"  round {i} cap {cap}: diff {dt1*1e3:.0f} ms "
                      f"shad {dt2*1e3:.0f} ms", flush=True)
    for cap in caps:
        print(f"RESULT leaf_max={cap}: diffuse "
              f"{best[(cap, 'diff')]*1e3:.0f} ms, shadow "
              f"{best[(cap, 'shad')]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [14, 10, 8])
