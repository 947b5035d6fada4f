import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import loupiote_tpu as lt
from loupiote_tpu.render import Renderer
from loupiote_tpu.config import RenderConfig
from loupiote_tpu.scene import Light

print("devices:", jax.devices(), flush=True)

# --- 1. standard Cornell drive -----------------------------------------
scene = lt.Scene.default()
lt.load_gltf_path("/root/reference/assets/cornell-box.glb", scene)
scene.lights = [Light(origin=np.array([-1, 3.55, -.8], np.float32),
    edge_u=np.array([2., 0, 0], np.float32),
    edge_v=np.array([0, 0, 1.6], np.float32),
    emission=np.array([1., .95, .9], np.float32), intensity=20.0)]
bufs = lt.build_scene_buffers(scene)

r = Renderer((256, 256), RenderConfig(downsample_factor=1.0, denoise=False))
r.set_resources(bufs)
cam = np.eye(4, dtype=np.float32)
cam[:3, 0], cam[:3, 1], cam[:3, 2], cam[:3, 3] = \
    [1, 0, 0], [0, 1, 0], [0, 0, -1], [0, .6, 12]
r.accumulate = True
t0 = time.time()
for _ in range(7):
    r.raytrace(cam)
img = r.blit()
print(f"cornell drive: {time.time()-t0:.1f}s  mean={img[..., :3].mean():.1f} "
      f"nonzero={(img[..., :3] > 0).mean():.3f}", flush=True)
from PIL import Image
Image.fromarray(img).save("/tmp/verify_r5_cornell.png")
ok_cornell = img[..., :3].mean() > 10 and (img[..., :3] > 0).mean() > 0.5

# --- 2. candidate TLAS device check ------------------------------------
# 20 overlapping instances of one mesh (> TLAS_UNROLL_MAX): cand vs scan
# parity ON DEVICE, plus the forced-drain path (C=1).
from loupiote_tpu.ops.intersect import intersect_any, intersect_rays, occluded
from loupiote_tpu.scene import Scene, build_scene_buffers
from loupiote_tpu.scene.instanced import build_instanced_buffers
from loupiote_tpu.scene.types import Instance, Mesh

rng = np.random.default_rng(7)
n = 40
base = (rng.random((n, 3), dtype=np.float32) - 0.5) * 1.5
p1 = base + (rng.random((n, 3), dtype=np.float32) - 0.5) * 0.4
p2 = base + (rng.random((n, 3), dtype=np.float32) - 0.5) * 0.4
mesh = Mesh(positions=np.concatenate([base, p1, p2]).astype(np.float32),
            normals=None, texcoords=None,
            indices=np.arange(3 * n, dtype=np.int32).reshape(3, n).T.reshape(-1))
sc = Scene.default()
sc.meshes.append(mesh)
for _ in range(20):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (rng.random(3) - 0.5) * 2.0
    sc.instances.append(Instance(mesh_index=0, model_to_world=m,
                                 material_index=0))
flat = build_scene_buffers(sc)
inst = build_instanced_buffers(sc)

R = 1024
ro = np.asarray((rng.random((R, 3)) - 0.5) * 8, np.float32)
rd = np.asarray(rng.random((R, 3)) - 0.5, np.float32)
rd /= np.linalg.norm(rd, axis=1, keepdims=True)
import jax.numpy as jnp
ro, rd = jnp.asarray(ro), jnp.asarray(rd)

want = jax.block_until_ready(intersect_rays(flat, ro, rd))
os.environ["LOUPIOTE_TLAS"] = "cand"
got = jax.block_until_ready(intersect_any(inst, ro, rd))
wh = np.asarray(want.tri) >= 0
hit_ok = (wh == (np.asarray(got.tri) >= 0)).all()
t_ok = np.allclose(np.asarray(got.t)[wh], np.asarray(want.t)[wh],
                   rtol=1e-4, atol=1e-4)
os.environ["LOUPIOTE_TLAS_C"] = "1"
drain = jax.block_until_ready(intersect_any(inst, ro, rd))
drain_ok = (np.asarray(drain.tri) >= 0).tolist() == (np.asarray(got.tri) >= 0).tolist()
del os.environ["LOUPIOTE_TLAS_C"]
os.environ["LOUPIOTE_TLAS"] = "scan"
scan = jax.block_until_ready(intersect_any(inst, ro, rd))
# INFORMATIONAL ONLY: the scan TLAS MISCOMPILES on XLA:TPU — 7/1024 rays
# return hits that float64 ground truth refutes (false misses AND false
# hits at central barycentrics; artifacts/r5_device8/tlas_groundtruth.log).
# On CPU the two modes agree exactly (tests/test_instanced.py). The
# candidate TLAS (default) matches the flattened oracle on device.
sh = np.asarray(scan.tri) >= 0
scan_ok = (sh == (np.asarray(got.tri) >= 0)).all() and np.allclose(
    np.asarray(scan.t)[sh], np.asarray(got.t)[sh], rtol=1e-4, atol=1e-4)
os.environ["LOUPIOTE_TLAS"] = "cand"
dist = jnp.full(R, 4.0)
occ_flat = np.asarray(occluded(flat, ro, rd, dist))
occ_inst = np.asarray(occluded(inst, ro, rd, dist))
occ_ok = (occ_flat == occ_inst).all()
print(f"cand TLAS device: hit_ok={hit_ok} t_ok={t_ok} drain_ok={drain_ok} "
      f"scan_ok={scan_ok}(info) occ_ok={occ_ok}", flush=True)

ok = all([ok_cornell, hit_ok, t_ok, drain_ok, occ_ok])
print("VERIFY-TPU", "OK" if ok else "FAIL", flush=True)
