"""Can AOT executable serialization kill the fresh-process compile stall?

Round-5 cache probe (artifacts/r5_device2/cache_probe_{a,b}.log): the
persistent compile cache hits IN-PROCESS (re-jit after clear_caches:
12.4 s) but a FRESH process still pays 70-94 s for the same headline
program — the axon client re-does the expensive part per process. The
standard JAX answer is AOT: jit(...).lower().compile() once, then
``jax.experimental.serialize_executable.serialize`` the executable to
disk; later processes deserialize and run without any compile service
round-trip.

Stage A (``--save``): build the Cornell interactive frame executable,
serialize to /tmp/aot_frame.bin, time a warm call.
Stage B (``--load``): fresh process deserializes and runs; the time from
process start to first frame result is the number that matters.

Usage: python experiments/aot_probe.py          (runs A then B in a
       subprocess and prints both timings)
"""

import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOB = "/tmp/aot_frame.bin"
W = H = 256


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _frame():
    import jax.numpy as jnp
    import numpy as np

    import loupiote_tpu as lt
    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import Light

    scene = lt.Scene.default()
    lt.load_gltf_path("/root/reference/assets/cornell-box.glb", scene)
    scene.lights = [Light(
        origin=np.array([-1, 3.55, -.8], np.float32),
        edge_u=np.array([2., 0, 0], np.float32),
        edge_v=np.array([0, 0, 1.6], np.float32),
        emission=np.array([1., .95, .9], np.float32), intensity=20.0)]
    bufs = lt.build_scene_buffers(scene)
    cam = np.eye(4, dtype=np.float32)
    cam[:3, 2] = [0, 0, -1]
    cam[:3, 3] = [0, .6, 12]

    def fn(b, k):
        return trace_paths(b, jnp.asarray(cam), W, H, k, bounces=3)[0]

    return fn, bufs


def save():
    jax = _setup()
    import jax.random as jr
    from jax.experimental import serialize_executable

    t_start = time.time()
    fn, bufs = _frame()
    lowered = jax.jit(fn).lower(bufs, jr.PRNGKey(0))
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[save] compile: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    with open(BLOB, "wb") as f:
        pickle.dump({"payload": payload, "in_tree": in_tree,
                     "out_tree": out_tree}, f)
    print(f"[save] serialize: {time.time() - t0:.1f}s "
          f"({os.path.getsize(BLOB) / 1e6:.1f} MB)", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(compiled(bufs, jr.PRNGKey(1)))
    print(f"[save] frame: {(time.time() - t0) * 1e3:.1f} ms "
          f"(mean {float(out.mean()):.4f}); total {time.time() - t_start:.1f}s",
          flush=True)


def load():
    t_start = time.time()
    jax = _setup()
    import jax.random as jr
    from jax.experimental import serialize_executable

    fn, bufs = _frame()  # host-side scene build only (no compile)
    t0 = time.time()
    with open(BLOB, "rb") as f:
        d = pickle.load(f)
    compiled = serialize_executable.deserialize_and_load(
        d["payload"], d["in_tree"], d["out_tree"])
    print(f"[load] deserialize+load: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(compiled(bufs, jr.PRNGKey(2)))
    print(f"[load] first frame: {(time.time() - t0) * 1e3:.1f} ms "
          f"(mean {float(out.mean()):.4f})", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(compiled(bufs, jr.PRNGKey(3)))
    print(f"[load] second frame: {(time.time() - t0) * 1e3:.1f} ms",
          flush=True)
    print(f"[load] process start -> first frame: "
          f"{time.time() - t_start:.1f}s", flush=True)


if __name__ == "__main__":
    if "--save" in sys.argv:
        save()
    elif "--load" in sys.argv:
        load()
    else:
        here = os.path.abspath(__file__)
        for stage in ("--save", "--load"):
            p = subprocess.run([sys.executable, here, stage], timeout=2700)
            if p.returncode:
                print(f"{stage} rc={p.returncode}", flush=True)
                break
