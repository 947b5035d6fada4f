"""Benchmark: Sponza-scale path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Headline (BASELINE.json): Mrays/s/chip at 1080p on a ~260k-triangle
architectural scene (procedural Sponza stand-in; the asset is not mounted),
3 bounces + NEE — the reference's frame shape (renderer.rs:398-399).
vs_baseline measures against the 100 Mrays/s/chip north-star target.

Extras cover the other BASELINE configs: primary-wave throughput, and the
Cornell 1080p-window interactive frame (1 spp + A-SVGF at the reference's
0.5x internal resolution).
"""

import json
import sys
import time

import numpy as np


def _timeit(fn, n, argfn):
    """Min-of-n per-call time with FRESH args per call (argfn(i) -> args):
    the tunneled TPU backend caches identical-input executions, and the
    pool shows 2-20x contended windows; min-of-fresh reflects capability."""
    import jax

    out = fn(*argfn(-1))
    jax.block_until_ready(out)
    best = float("inf")
    for i in range(max(n, 6)):
        args = argfn(i)
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.config import BlitMode, RenderConfig
    from loupiote_tpu.ops.pallas_intersect import intersect_pallas
    from loupiote_tpu.ops.raygen import generate_rays
    from loupiote_tpu.render import Renderer
    from loupiote_tpu.render.integrator import to_tile_order, trace_paths
    from loupiote_tpu.scene import (Light, Scene, build_scene_buffers,
                                    load_gltf_path)
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    width, height = 1920, 1080
    bounces = 3
    extra = {"device": str(jax.devices()[0])}

    # --- Headline: arch-260k full frame at 1080p. ---------------------------
    t0 = time.time()
    scene = build_arch_scene(260_000)
    bufs = build_scene_buffers(scene)
    extra["scene_build_s"] = round(time.time() - t0, 1)
    extra["triangles"] = scene.stats()["triangles"]
    cam = jnp.asarray(arch_camera())

    # NOTE: scene buffers are jit ARGUMENTS, not closure constants — a
    # closure embeds the ~90MB scene tables as per-executable constants,
    # which the tunneled backend rejects after a few executables.
    frame_jit = jax.jit(lambda b, k: trace_paths(b, cam, width, height, k,
                                                 bounces=bounces)[0])
    t0 = time.time()
    dt, out = _timeit(frame_jit, 4, lambda i: (bufs, jr.PRNGKey(i + 10)))
    extra["compile_s"] = round(time.time() - t0 - 6 * dt, 1)

    pixels = width * height
    rays_per_frame = pixels * bounces * 2  # path segments + NEE shadow rays
    mrays = rays_per_frame / dt / 1e6
    extra["frame_ms"] = round(dt * 1000, 1)
    extra["nonzero_pixel_frac"] = round(
        float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean()), 3)

    def _guard(name, fn):
        try:
            fn()
        except Exception as e:  # never kill the bench for an extra
            extra[name + "_error"] = repr(e)[:200]

    # --- Extras: per-wave traversal throughput (the perf-regression gate:
    # VERDICT r1 item 6 — per-wave ms recorded every round). Primary =
    # coherent camera wave; diffuse = cosine-sampled continuation wave
    # after the octant+Morton sort; shadow = any-hit wave on the same
    # origins. NOTE: inputs must be fresh per call — the tunneled TPU
    # backend caches identical-input executions, which silently inflates
    # same-input timing by ~10-100x.
    from loupiote_tpu.ops.intersect import intersect_any, occluded
    from loupiote_tpu.ops.sampling import (cosine_sample_hemisphere,
                                           orthonormal_basis, to_world)
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order

    def primary_rays(k):
        ro, rd = generate_rays(cam, width, height, 0.785,
                               jr.uniform(k, (pixels, 2)))
        return (to_tile_order(ro, width, height),
                to_tile_order(rd, width, height))

    def _wave_extras():
      prim = jax.jit(lambda b, k: intersect_any(b, *primary_rays(k)).t)
      outp = prim(bufs, jr.PRNGKey(100))
      jax.block_until_ready(outp)
      dtp = float("inf")
      for i in range(6):
          t0 = time.time()
          outp = prim(bufs, jr.PRNGKey(101 + i))  # fresh key per call
          jax.block_until_ready(outp)
          dtp = min(dtp, time.time() - t0)
      extra["primary_mrays"] = round(pixels / dtp / 1e6, 1)
      extra["primary_ms"] = round(dtp * 1e3, 1)

      @jax.jit
      def diffuse_wave(b, k):
          ro, rd = primary_rays(k)
          hit = intersect_any(b, ro, rd)
          tri = jnp.maximum(hit.tri, 0)
          gn = b.tri_shade[tri, 17:20]
          gn = jnp.where((jnp.sum(gn * rd, axis=1) > 0)[:, None], -gn, gn)
          pos = ro + hit.t[:, None] * rd + gn * 1e-3
          u = jr.uniform(jr.fold_in(k, 1), (pixels, 2))
          tb, bt = orthonormal_basis(gn)
          nd = to_world(gn, tb, bt, cosine_sample_hemisphere(u[:, 0], u[:, 1]))
          alive = hit.tri >= 0
          order = sort_order(ray_sort_key(pos, nd, alive, b.node_min[0],
                                          b.node_max[0]))
          return pos[order], nd[order], alive[order]

      dro, drd, dal = jax.block_until_ready(
          diffuse_wave(bufs, jr.PRNGKey(200)))
      diff = jax.jit(lambda sc, a, b, al: intersect_any(sc, a, b,
                                                        active=al).t)
      shad = jax.jit(lambda sc, a, b, al: occluded(sc, a, b,
                                                   jnp.full(a.shape[0], 30.0),
                                                   active=al))
      for name, fn in (("diffuse_sorted_ms", diff), ("shadow_ms", shad)):
          out = fn(bufs, dro, drd, dal)
          jax.block_until_ready(out)
          best = float("inf")
          for i in range(4):
              dro, drd, dal = jax.block_until_ready(
                  diffuse_wave(bufs, jr.PRNGKey(201 + i)))
              t0 = time.time()
              out = fn(bufs, dro, drd, dal)
              jax.block_until_ready(out)
              best = min(best, time.time() - t0)
          extra[name] = round(best * 1e3, 1)

    _guard("waves", _wave_extras)

    def _cornell():
      # --- Extra: Cornell 1080p-window interactive (config[2]). ---------------
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
      r = Renderer((width, height), RenderConfig(downsample_factor=0.5))
      r.set_resources(bufs2)
      r.set_blit_mode(BlitMode.DENOISED_PATHTRACE)
      r.raytrace(cam2)
      jax.block_until_ready(r.state.denoised)
      dtc = float("inf")
      for _ in range(8):
          t0 = time.time()
          r.raytrace(cam2)
          jax.block_until_ready(r.state.denoised)
          dtc = min(dtc, time.time() - t0)
      extra["cornell_1spp_svgf_ms"] = round(dtc * 1000, 1)
      extra["cornell_fps"] = round(1.0 / dtc, 1)


    _guard("cornell", _cornell)

    result = {
        "metric": "arch260k_1080p_3bounce_nee_mrays_per_s_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
