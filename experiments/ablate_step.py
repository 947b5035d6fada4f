"""Wide-kernel per-step op-cost census by ablation.

Runs the production wide kernel on the saved arch-260k diffuse wave
(/tmp/subpacket_wave.npz) with max_steps forced to two values; the slope
(t2-t1)/(s2-s1)/cells is the marginal per-step cost while traversal is
active. Ablations knock out one block each (results are garbage — only
cost matters); the slope delta attributes the ~1.2us/step budget:

    full     unchanged kernel
    flush    leaf MT flush never fires
    rank     index-order ranks (pairwise-tnear matrix dropped)
    stack    one-hot stack scatter dropped
    box      slab test replaced with 2-op dummy
    bare     all of the above

Each variant runs in its own subprocess (the tunneled backend wedges
after several large pallas executables in one process).

Usage: python experiments/ablate_step.py          # all variants
       python experiments/ablate_step.py <name>   # one variant
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"
S1, S2 = 40, 240
VARIANTS = ["full", "flush", "rank", "stack", "box", "bare"]


def run_one(name):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_wide import TILE, _wide_trace
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    ablate = {"full": "", "bare": "flush,rank,stack,box"}.get(name, name)

    import functools

    bufs = build_scene_buffers(build_arch_scene(260_000))
    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    R = min((len(dro) // TILE) * TILE, 1024 * TILE)
    G = R // TILE

    def shape(x):
        return jnp.asarray(x[:R].reshape(G, 8, 128))

    # Everything device-resident ONCE; timed calls vary only a scalar
    # (fresh inputs with zero H2D — the tunnel makes per-call transfers
    # the dominant, noisy cost otherwise).
    dev = dict(
        rows=bufs.trav_rows,
        ox=shape(dro[:, 0]), oy=shape(dro[:, 1]), oz=shape(dro[:, 2]),
        dx=shape(drd[:, 0]), dy=shape(drd[:, 1]), dz=shape(drd[:, 2]),
        t0=jnp.full((G, 8, 128), 3e4, jnp.float32),
        act=shape(alive.astype(np.int32)))
    dev = jax.device_put(dev)

    @functools.partial(jax.jit, static_argnames=("ms",))
    def run(d, eps, ms):
        t, tri = _wide_trace(
            d["rows"], d["ox"] + eps, d["oy"], d["oz"],
            d["dx"], d["dy"], d["dz"], d["t0"], d["act"],
            any_hit=False, end_index=int(bufs.wide_end), max_steps=ms,
            leaf_cap=int(bufs.leaf_cap), stack_size=int(bufs.wide_stack),
            ablate=ablate)
        return t[0, 0, :4]

    best = {}
    for ms in (S1, S2):
        out = run(dev, jnp.float32(0.5), ms)
        jax.block_until_ready(out)
        np.asarray(out)
        b = float("inf")
        for i in range(8):
            eps = jnp.float32((i + 1) * 1e-6)
            t0 = time.time()
            np.asarray(run(dev, eps, ms))
            b = min(b, time.time() - t0)
        best[ms] = b
    slope = (best[S2] - best[S1]) / (S2 - S1) / G
    print(f"ABLATE {name}: {slope*1e9:.0f} ns/step "
          f"(raw {best[S1]*1e3:.0f}/{best[S2]*1e3:.0f} ms, G={G})",
          flush=True)


def main():
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    here = os.path.abspath(__file__)
    for name in VARIANTS:
        r = subprocess.run([sys.executable, here, name],
                           capture_output=True, text=True, timeout=2400)
        lines = [ln for ln in r.stdout.splitlines() if "ABLATE" in ln]
        print(lines[-1] if lines else
              f"ABLATE {name}: FAILED rc={r.returncode}: "
              f"{(r.stderr or r.stdout)[-300:]}", flush=True)


if __name__ == "__main__":
    main()
