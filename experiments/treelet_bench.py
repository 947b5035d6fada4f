"""A/B the treelet pipeline vs the wide sub-packet kernel on the arch-260k
diffuse and shadow waves (the round-3 headline experiment).

Run: python experiments/treelet_bench.py [diffuse|shadow|both]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(which="both"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from measure_traversal import build, make_waves

    from loupiote_tpu.ops.pallas_wide import intersect_wide, occluded_wide
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order
    from experiments.treelet.pipeline import (treelet_intersect,
                                                   treelet_occluded)

    t0 = time.time()
    bufs, cam = build()
    assert bufs.treelet is not None, "treelet tables missing"
    td = bufs.treelet
    print(f"scene {time.time()-t0:.0f}s: {td.num_subtrees} subtrees, "
          f"top {td.num_top} ({td.top_tiles} tiles)", flush=True)
    ro, rd, dro, drd, alive = make_waves(bufs, cam)
    order = np.asarray(sort_order(ray_sort_key(
        jnp.asarray(dro), jnp.asarray(drd), jnp.asarray(alive),
        bufs.node_min[0], bufs.node_max[0])))
    dro, drd, alive = dro[order], drd[order], alive[order]
    R = len(dro)
    dist = np.full(R, 30.0, np.float32)

    def timeit(name, fn, n=5):
        best = float("inf")
        out0 = None
        for i in range(n):
            a = jnp.asarray(dro + np.float32(i) * 1e-6)
            d = jnp.asarray(drd)
            al = jnp.asarray(alive)
            t0 = time.time()
            out = jax.block_until_ready(fn(a, d, al))
            np.asarray(out[0][:8] if isinstance(out, tuple) else out[:8])
            if i == 0:
                out0 = jax.tree.map(np.asarray, out)
                print(f"{name}: compile+first {time.time()-t0:.1f}s",
                      flush=True)
            else:
                best = min(best, time.time() - t0)
        print(f"{name}: {best*1e3:.1f} ms", flush=True)
        return best, out0

    if which in ("diffuse", "both"):
        tl = jax.jit(lambda a, d, al: treelet_intersect(
            bufs, a, d, active=al)[:2])
        wd = jax.jit(lambda a, d, al: intersect_wide(
            bufs, a, d, active=al)[:2])
        t_tl, o_tl = timeit("diffuse treelet", tl)
        t_wd, o_wd = timeit("diffuse wide", wd)
        al = alive
        same_tri = (o_tl[1] == o_wd[1])[al]
        close_t = np.isclose(o_tl[0], o_wd[0], rtol=1e-5)[al]
        print(f"diffuse agreement: tri {same_tri.mean()*100:.3f}% "
              f"t {close_t.mean()*100:.3f}%  speedup {t_wd/t_tl:.2f}x",
              flush=True)

    if which in ("shadow", "both"):
        tmax = jnp.asarray(dist)
        tls = jax.jit(lambda a, d, al: treelet_occluded(
            bufs, a, d, tmax, active=al))
        wds = jax.jit(lambda a, d, al: occluded_wide(
            bufs, a, d, tmax * (1 - 1e-3), active=al))
        t_tl, o_tl = timeit("shadow treelet", tls)
        t_wd, o_wd = timeit("shadow wide", wds)
        agree = (o_tl == o_wd)[alive]
        print(f"shadow agreement: {agree.mean()*100:.3f}%  "
              f"speedup {t_wd/t_tl:.2f}x", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
