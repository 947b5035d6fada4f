"""Cornell interactive frame time vs BVH2-kernel sub rows.

One process per value (the env is read at trace time and the frame jit
would not retrace on an env change).

Usage: python experiments/cornell_sub.py <sub>
       python experiments/cornell_sub.py        # all of 8/16/32
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(sub):
    os.environ["LOUPIOTE_BVH2_SUB"] = str(sub)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from loupiote_tpu.config import BlitMode, RenderConfig
    from loupiote_tpu.render import Renderer
    from loupiote_tpu.scene import (Light, Scene, build_scene_buffers,
                                    load_gltf_path)

    s2 = Scene.default()
    load_gltf_path("/root/reference/assets/cornell-box.glb", s2)
    s2.lights = [Light(
        origin=np.array([-1.0, 3.55, -0.8], np.float32),
        edge_u=np.array([2.0, 0.0, 0.0], np.float32),
        edge_v=np.array([0.0, 0.0, 1.6], np.float32),
        emission=np.array([1.0, 0.95, 0.9], np.float32), intensity=20.0)]
    bufs2 = build_scene_buffers(s2)
    cam2 = np.eye(4, dtype=np.float32)
    cam2[:3, 0], cam2[:3, 1] = [1, 0, 0], [0, 1, 0]
    cam2[:3, 2], cam2[:3, 3] = [0, 0, -1], [0, 0.6, 12]
    r = Renderer((1920, 1080), RenderConfig(downsample_factor=0.5))
    r.set_resources(bufs2)
    r.set_blit_mode(BlitMode.DENOISED_PATHTRACE)
    t0 = time.time()
    r.raytrace(cam2)
    np.asarray(r.state.denoised)
    comp = time.time() - t0
    best = float("inf")
    for i in range(10):
        cam2 = cam2.copy()
        cam2[0, 3] += 1e-3
        t0 = time.time()
        r.raytrace(cam2)
        np.asarray(r.state.probe)
        best = min(best, time.time() - t0)
    print(f"CORNELL sub={sub}: {best*1e3:.1f} ms ({1/best:.1f} fps, "
          f"compile {comp:.0f}s)", flush=True)


def main():
    if len(sys.argv) > 1:
        run_one(int(sys.argv[1]))
        return
    here = os.path.abspath(__file__)
    for sub in (8, 16, 32):
        r = subprocess.run([sys.executable, here, str(sub)],
                           capture_output=True, text=True, timeout=2400)
        lines = [ln for ln in r.stdout.splitlines() if "CORNELL" in ln]
        print(lines[-1] if lines else
              f"CORNELL sub={sub}: FAILED {(r.stderr or '')[-200:]}",
              flush=True)


if __name__ == "__main__":
    main()
