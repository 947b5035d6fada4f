"""Host-side overlap statistics for the candidate-gather TLAS design.

Question: if each ray only traverses its C nearest overlapping instance
AABBs (per unique mesh), how big must C be before the exact drain loop
never fires at bench scale?  Counts, for the bench instanced scene's
primary rays, how many prop AABBs each ray slab-overlaps, and how many
remain closer than the ray's eventual hall hit (the post-round-1 best_t
cull).  Pure numpy — no device.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene  # noqa: E402


def main():
    scene = build_arch_scene(260_000, textured=True, props=200, merged=True)
    # Prop AABBs in world space (instances 1..200; instance 0 is the hall).
    los, his = [], []
    for inst in scene.instances[1:]:
        mesh = scene.meshes[inst.mesh_index]
        v = mesh.positions
        lo_o, hi_o = v.min(0), v.max(0)
        m = inst.model_to_world
        pts = np.array([[x, y, z] for x in (lo_o[0], hi_o[0])
                        for y in (lo_o[1], hi_o[1])
                        for z in (lo_o[2], hi_o[2])], np.float32)
        w = pts @ m[:3, :3].T + m[:3, 3]
        los.append(w.min(0))
        his.append(w.max(0))
    lo = np.stack(los)  # (K,3)
    hi = np.stack(his)
    K = len(lo)

    # Primary rays: sample a 1080p-like grid at stride 3 (~230k rays).
    cam = np.asarray(arch_camera(), np.float32)
    W, H = 1920, 1080
    xs = (np.arange(0, W, 3) + 0.5) / W * 2 - 1
    ys = (np.arange(0, H, 3) + 0.5) / H * 2 - 1
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    aspect = W / H
    fov_t = np.tan(np.radians(45.0) / 2)
    # Match ops/raygen.py: d = right*ndc_x*tan*aspect + up*ndc_y*tan + fwd.
    d_cam = np.stack([gx * fov_t * aspect, -gy * fov_t,
                      np.ones_like(gx)], -1).reshape(-1, 3)
    rd = d_cam @ cam[:3, :3].T
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro = np.broadcast_to(cam[:3, 3], rd.shape).astype(np.float32)
    R = len(rd)

    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd, 1e-20)
    # Hall-hit distance proxy: distance to the hall's outer shell along the
    # ray (rays start inside the hall, so every ray exits at a wall; props
    # beyond the wall hit are culled after round 1). Use the hall AABB exit
    # t as an UPPER bound on best_t (conservative: real best_t is smaller,
    # e.g. pillar hits), so counts below overstate the drain pressure.
    hall = scene.meshes[scene.instances[0].mesh_index].positions
    h_lo, h_hi = hall.min(0), hall.max(0)
    ta = (h_lo[None] - ro) * inv
    tb = (h_hi[None] - ro) * inv
    t_exit = np.minimum(np.maximum(ta, tb).min(1), 1e30)

    # Per-ray overlap counts vs the K prop boxes, chunked.
    n_any = np.zeros(R, np.int32)
    n_near = np.zeros(R, np.int32)  # overlapping AND tnear < t_exit
    CH = 65536
    for s in range(0, R, CH):
        e = min(s + CH, R)
        ta = (lo[None, :, :] - ro[s:e, None, :]) * inv[s:e, None, :]
        tb = (hi[None, :, :] - ro[s:e, None, :]) * inv[s:e, None, :]
        tn = np.minimum(ta, tb).max(2)
        tf = np.maximum(ta, tb).min(2)
        ov = (tf >= np.maximum(tn, 1e-3)) & (tn <= 1e30)
        n_any[s:e] = ov.sum(1)
        n_near[s:e] = (ov & (tn <= t_exit[s:e, None])).sum(1)

    for name, n in (("any", n_any), ("near<t_exit", n_near)):
        qs = np.percentile(n, [50, 90, 99, 99.9, 99.99, 100])
        print(f"{name:12s} mean {n.mean():.2f}  p50/p90/p99/p99.9/p99.99/max ="
              f" {'/'.join(str(int(q)) for q in qs)}")
        for c in (4, 8, 12, 16, 24, 32):
            frac = (n > c).mean()
            print(f"  overlap>{c}: {frac:.6f} ({int(frac * R)} of {R} rays)")


if __name__ == "__main__":
    main()
