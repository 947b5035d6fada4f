"""Quantify cand-vs-scan TLAS disagreement on device.

scan_ok=False in verify_r5_tlas.py's strict tri-equality check: is it a
handful of equal-t ties (benign — visit order differs between modes) or a
systematic wrong-tri bug? Prints mismatch count, t deltas, and whether the
mismatching tris belong to instances whose boxes overlap at the hit point.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("LOUPIOTE_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from loupiote_tpu.ops.intersect import intersect_any, intersect_rays
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
ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)

want = jax.block_until_ready(intersect_rays(flat, ro_j, rd_j))
os.environ["LOUPIOTE_TLAS"] = "cand"
cand = jax.block_until_ready(intersect_any(inst, ro_j, rd_j))
os.environ["LOUPIOTE_TLAS"] = "scan"
scan = jax.block_until_ready(intersect_any(inst, ro_j, rd_j))

ct, st, wt = map(np.asarray, (cand.tri, scan.tri, want.tri))
ctt, stt, wtt = map(np.asarray, (cand.t, scan.t, want.t))
mis = ct != st
print(f"mismatches: {mis.sum()}/{R}")
for i in np.nonzero(mis)[0][:20]:
    print(f"  ray {i}: cand tri {ct[i]} t {ctt[i]:.6f} | "
          f"scan tri {st[i]} t {stt[i]:.6f} | oracle tri {wt[i]} t "
          f"{wtt[i]:.6f} dt(c-s)={ctt[i]-stt[i]:+.2e}")
cand_match = (ct == wt)[wt >= 0].mean()
scan_match = (st == wt)[wt >= 0].mean()
print(f"tri agreement with oracle: cand {cand_match:.4f} scan {scan_match:.4f}")
