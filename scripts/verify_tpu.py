"""Verify-skill drive on the real TPU: Cornell end-to-end through the
Renderer, structural image assertions, PNG saved to /tmp/verify_tpu.png.

Run by scripts/tpu_runbook.sh as step 1 the moment the tunnel returns.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import loupiote_tpu as lt
from loupiote_tpu.config import RenderConfig
from loupiote_tpu.render import Renderer
from loupiote_tpu.scene import Light


def main():
    print("devices:", jax.devices(), flush=True)
    scene = lt.Scene.default()
    lt.load_gltf_path("/root/reference/assets/cornell-box.glb", scene)
    scene.lights = [Light(
        origin=np.array([-1, 3.55, -.8], np.float32),
        edge_u=np.array([2., 0, 0], np.float32),
        edge_v=np.array([0, 0, 1.6], np.float32),
        emission=np.array([1., .95, .9], np.float32), intensity=20.0)]
    bufs = lt.build_scene_buffers(scene)
    r = Renderer((256, 256), RenderConfig(downsample_factor=1.0,
                                          denoise=False))
    r.set_resources(bufs)
    cam = np.eye(4, dtype=np.float32)
    cam[:3, 2] = [0, 0, -1]
    cam[:3, 3] = [0, .6, 12]
    r.accumulate = True
    t0 = time.time()
    r.raytrace(cam)
    print(f"first frame (compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(7):
        r.raytrace(cam)
    img = r.blit()
    print(f"7 frames + blit: {time.time() - t0:.2f}s", flush=True)
    m = img[..., :3].astype(np.float32).mean()
    left = img[:, :64, :3].astype(np.float32).mean(axis=(0, 1))
    right = img[:, -64:, :3].astype(np.float32).mean(axis=(0, 1))
    print(f"mean={m:.1f} left={left.round(1)} right={right.round(1)}",
          flush=True)
    assert m > 5, "image black"
    assert left[0] > left[1], "left wall not red-dominant"
    assert right[1] > right[0], "right wall not green-dominant"
    from PIL import Image

    Image.fromarray(img).save("/tmp/verify_tpu.png")
    print("VERIFY-TPU OK", flush=True)


if __name__ == "__main__":
    main()
