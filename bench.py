"""Benchmark: Sponza-scale path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Headline metric (BASELINE.json): Mrays/s/chip at 1080p on a ~260k-triangle
architectural scene (procedural stand-in; the Sponza asset is not mounted),
3 bounces + NEE — the reference's frame shape (renderer.rs:398-399).
vs_baseline is measured against the 100 Mrays/s/chip north-star target.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    width, height = 1920, 1080
    bounces = 3

    t0 = time.time()
    scene = build_arch_scene(260_000)
    stats = scene.stats()
    bufs = build_scene_buffers(scene)
    build_s = time.time() - t0

    cam = jnp.asarray(arch_camera())

    def frame(key):
        rad, _ = trace_paths(bufs, cam, width, height, key, bounces=bounces)
        return rad

    frame_jit = jax.jit(frame)

    # Warmup + compile.
    t0 = time.time()
    out = frame_jit(jr.PRNGKey(0))
    out.block_until_ready()
    compile_s = time.time() - t0

    n_frames = 4
    t0 = time.time()
    for i in range(n_frames):
        out = frame_jit(jr.PRNGKey(i + 1))
    out.block_until_ready()
    elapsed = time.time() - t0

    hit_frac = float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean())
    pixels = width * height
    # Path segments actually traced per frame: primary + (bounces-1)
    # continuation waves + one NEE shadow ray per path vertex.
    path_rays = pixels * bounces
    shadow_rays = pixels * bounces  # quad-light NEE (no probe bound here)
    rays_per_frame = path_rays + shadow_rays
    mrays = rays_per_frame * n_frames / elapsed / 1e6

    result = {
        "metric": "arch260k_1080p_3bounce_nee_mrays_per_s_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 3),
        "extra": {
            "frame_ms": round(elapsed / n_frames * 1000, 1),
            "path_mrays_only": round(path_rays * n_frames / elapsed / 1e6, 2),
            "triangles": stats["triangles"],
            "compile_s": round(compile_s, 1),
            "scene_build_s": round(build_s, 1),
            "nonzero_pixel_frac": round(hit_frac, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
