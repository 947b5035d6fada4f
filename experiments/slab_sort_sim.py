"""Does SLAB-LOCAL ray sorting retain the global sort's coherence win?

The inter-bounce regroup is ~410 ms of frame glue (VERDICT r3): XLA argsort
at wave scale is ~160 ns/key and each permuted field gathers at
~160-285 ns/element. A Pallas kernel can sort + apply a permutation CHEAPLY
only within a VMEM-resident slab (16k-64k rays). This experiment answers
the design question before any kernel is built: replay traversal step
counts (the kernel cost metric) for
    global   — the saved globally-sorted diffuse wave,
    slabN    — a RANDOM permutation of the wave re-sorted within N-ray
               slabs (pessimistic: the real pre-sort wave is tile-coherent,
               a random shuffle is not),
    random   — the random permutation unsorted (worst case).

Usage: python experiments/slab_sort_sim.py [n_cells]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


def replay_cells(rows, end_index, o, d, act, cells, rng):
    from subpacket_sweep import simulate

    tot_i = tot_l = pk = 0
    for ci in cells:
        base = ci * 1024
        for p in range(8):
            sl = slice(base + p * 128, base + (p + 1) * 128)
            it, lf = simulate(rows, end_index, o[sl], d[sl], act[sl])
            tot_i += it
            tot_l += lf
            pk += 1
    return tot_i / pk, tot_l / pk


def main(n_cells=6):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from loupiote_tpu.ops.sort import ray_sort_key, sort_order
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    R = dro.shape[0]

    t0 = time.time()
    bufs = build_scene_buffers(build_arch_scene(260_000))
    rows = np.asarray(bufs.trav_rows)
    lo = np.asarray(bufs.node_min[0])
    hi = np.asarray(bufs.node_max[0])
    print(f"scene build {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(7)
    cells = rng.choice(R // 1024, size=n_cells, replace=False)

    def key_sort(o, d, a):
        k = ray_sort_key(jnp.asarray(o), jnp.asarray(d), jnp.asarray(a),
                         jnp.asarray(lo), jnp.asarray(hi))
        return np.asarray(sort_order(k))

    perm = rng.permutation(R)
    uo, ud, ua = dro[perm], drd[perm], alive[perm]

    waves = {"global": (dro, drd, alive), "random": (uo, ud, ua)}
    for slab in (16384, 65536):
        so = np.empty_like(uo)
        sd = np.empty_like(ud)
        sa = np.empty_like(ua)
        for s in range(0, R, slab):
            e = min(s + slab, R)
            o_ = key_sort(uo[s:e], ud[s:e], ua[s:e])
            so[s:e], sd[s:e], sa[s:e] = uo[s:e][o_], ud[s:e][o_], ua[s:e][o_]
        waves[f"slab{slab//1024}k"] = (so, sd, sa)

    print(f"{'wave':>10}  int/pkt  leaf/pkt  steps/pkt  vs_global")
    base = None
    for name, (o, d, a) in waves.items():
        it, lf = replay_cells(rows, bufs.wide_end, o, d, a, cells, rng)
        steps = it + lf
        if base is None:
            base = steps
        print(f"{name:>10}  {it:7.1f}  {lf:8.1f}  {steps:9.1f}  "
              f"{steps/base:9.2f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
