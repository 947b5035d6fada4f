"""Float64 ground truth for the 7 TPU scan-TLAS mismatches.

For each disputed ray, runs exact Moller-Trumbore in numpy float64 over
all instanced triangles and prints the true closest hit, so we can tell
grazing-hit rounding (true t sits within fp32 noise of both answers)
from a real wrong result.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from loupiote_tpu.scene import Scene
from loupiote_tpu.scene.types import Instance, Mesh

rng = np.random.default_rng(7)
n = 40
base = (rng.random((n, 3), dtype=np.float32) - 0.5) * 1.5
p1 = base + (rng.random((n, 3), dtype=np.float32) - 0.5) * 0.4
p2 = base + (rng.random((n, 3), dtype=np.float32) - 0.5) * 0.4
pos = np.concatenate([base, p1, p2]).astype(np.float32)
idx = np.arange(3 * n, dtype=np.int32).reshape(3, n).T.reshape(-1)

insts = []
for _ in range(20):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (rng.random(3) - 0.5) * 2.0
    insts.append(m)

R = 1024
ro = np.asarray((rng.random((R, 3)) - 0.5) * 8, np.float64)
rd = np.asarray(rng.random((R, 3)) - 0.5, np.float64)
rd /= np.linalg.norm(rd, axis=1, keepdims=True)

# World-space triangles, float64: (20*40, 3, 3)
tris = []
v = pos[idx.reshape(-1, 3)]  # (n, 3, 3) object space
for m in insts:
    w = v.astype(np.float64) @ m[:3, :3].T.astype(np.float64) + m[:3, 3]
    tris.append(w)
T = np.concatenate(tris)  # (800, 3, 3)
e1 = T[:, 1] - T[:, 0]
e2 = T[:, 2] - T[:, 0]

def closest(i):
    o, d = ro[i], rd[i]
    p = np.cross(d[None], e2)
    det = (e1 * p).sum(1)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0.0)
    s = o[None] - T[:, 0]
    u = (s * p).sum(1) * inv
    q = np.cross(s, e1)
    vv = (d[None] * q).sum(1) * inv
    t = (e2 * q).sum(1) * inv
    hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-3)
    if not hit.any():
        return -1, np.inf, None, None
    j = np.where(hit, t, np.inf).argmin()
    return j, t[j], u[j], vv[j]

for i in (9, 47, 91, 185, 472, 621, 964):
    j, t, u, vv = closest(i)
    extra = "" if j < 0 else f" u={u:.6f} v={vv:.6f} u+v={u+vv:.6f}"
    print(f"ray {i}: true closest tri {j} t {t:.6f}{extra}")
