"""How many kernel steps does the diffuse wave ACTUALLY take on device?

Runs _wide_trace on the saved sorted diffuse wave with a max_steps sweep;
convergence = fraction of lanes whose t matches the largest-cap run. The
host sim says ~126 visits/sub-packet — if the device needs far more
steps, the kernel (not the descent order) is at fault.

Usage: python experiments/steps_probe.py [ablate]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE = "/tmp/subpacket_wave.npz"


def main(ablate=""):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from loupiote_tpu.ops.pallas_wide import TILE, _wide_trace
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    bufs = build_scene_buffers(build_arch_scene(260_000))
    data = np.load(WAVE)
    dro, drd, alive = data["dro"], data["drd"], data["alive"]
    R = min((len(dro) // TILE) * TILE, 512 * TILE)
    G = R // TILE

    def shape(x):
        return jnp.asarray(x[:R].reshape(G, 8, 128))

    dev = jax.device_put(dict(
        rows=bufs.trav_rows,
        ox=shape(dro[:, 0]), oy=shape(dro[:, 1]), oz=shape(dro[:, 2]),
        dx=shape(drd[:, 0]), dy=shape(drd[:, 1]), dz=shape(drd[:, 2]),
        t0=jnp.full((G, 8, 128), 3e4, jnp.float32),
        act=shape(alive.astype(np.int32))))

    @functools.partial(jax.jit, static_argnames=("ms",))
    def run(d, eps, ms):
        t, tri = _wide_trace(
            d["rows"], d["ox"] + eps, d["oy"], d["oz"],
            d["dx"], d["dy"], d["dz"], d["t0"], d["act"],
            any_hit=False, end_index=int(bufs.wide_end), max_steps=ms,
            leaf_cap=int(bufs.leaf_cap), stack_size=int(bufs.wide_stack),
            ablate=ablate)
        return t

    caps = [100, 150, 200, 300, 400, 800, 1600]
    ref = np.asarray(jax.block_until_ready(
        run(dev, jnp.float32(0.0), 4 * int(bufs.wide_end))))
    for ms in caps:
        out0 = np.asarray(jax.block_until_ready(
            run(dev, jnp.float32(0.0), ms)))
        conv = float((out0 == ref).mean())
        t0 = time.time()
        for i in range(3):
            out = run(dev, jnp.float32((i + 1) * 1e-6), ms)
            jax.block_until_ready(out)
            np.asarray(out[0, 0, :4])
        dt = (time.time() - t0) / 3
        print(f"ms={ms:5d}: {dt*1e3:7.1f} ms  conv={conv*100:6.2f}%",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "")
