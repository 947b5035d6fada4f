"""Stage 3: b1 (raygen + instanced intersect + shade) SIGILLs but the bare
instanced intersect compiles. Which surrounding stage arms the trigger?

Cases (all on the 201-instance scene, 256x144 coherent primary rays):
  rays_only     raygen -> intersect.t           (adds raygen vs stage 2)
  plus_decode   raygen -> intersect -> decode_surface fields
  plus_shade    raygen -> intersect -> shade_step (no gbuffer decode)
  no_pallas     full b1 with LOUPIOTE_NO_PALLAS=1 (hall BLAS also XLA —
                tests Pallas-call + scan coexistence in ONE program)
  sort_off      full b1 with sort_rays=False (b1 has no sort anyway;
                control)

Usage: python experiments/scan_crash_probe3.py
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 256, 144


def _env():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from loupiote_tpu.scene.instanced import build_instanced_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    cam = jnp.asarray(np.asarray(arch_camera()))
    scene = build_arch_scene(8_000, textured=False, props=200, merged=True)
    bufs = build_instanced_buffers(scene)
    return jax, jnp, cam, bufs


def _primary(jnp, cam, key):
    import jax.random as jr

    from loupiote_tpu.ops.raygen import generate_rays
    from loupiote_tpu.render.integrator import to_tile_order

    jit_uv = jr.uniform(key, (W * H, 2))
    ro, rd = generate_rays(cam, W, H, 0.7853982, jit_uv)
    return to_tile_order(ro, W, H), to_tile_order(rd, W, H)


def case_rays_only():
    jax, jnp, cam, bufs = _env()
    import jax.random as jr

    from loupiote_tpu.ops.intersect import intersect_any

    def f(b, k):
        ro, rd = _primary(jnp, cam, k)
        return intersect_any(b, ro, rd).t

    t0 = time.time()
    out = jax.block_until_ready(jax.jit(f)(bufs, jr.PRNGKey(0)))
    print(f"OK {time.time() - t0:.1f}s hits={float((out < 1e30).mean()):.3f}",
          flush=True)


def case_plus_decode():
    jax, jnp, cam, bufs = _env()
    import jax.random as jr

    from loupiote_tpu.ops.intersect import intersect_any
    from loupiote_tpu.ops.shade import decode_surface

    def f(b, k):
        ro, rd = _primary(jnp, cam, k)
        hit = intersect_any(b, ro, rd)
        surf = decode_surface(b, ro, rd, hit, textures=b.has_textures)
        return surf.n_shade.sum() + surf.albedo.sum()

    t0 = time.time()
    jax.block_until_ready(jax.jit(f)(bufs, jr.PRNGKey(0)))
    print(f"OK {time.time() - t0:.1f}s", flush=True)


def case_plus_shade():
    jax, jnp, cam, bufs = _env()
    import jax.random as jr

    from loupiote_tpu.ops.intersect import intersect_any
    from loupiote_tpu.ops.shade import BounceState, shade_step

    def f(b, k):
        ro, rd = _primary(jnp, cam, k)
        R = W * H
        state = BounceState(ro=ro, rd=rd, throughput=jnp.ones((R, 3)),
                            radiance=jnp.zeros((R, 3)),
                            alive=jnp.ones(R, jnp.bool_),
                            bsdf_pdf=jnp.zeros(R),
                            use_mis=jnp.zeros(R, jnp.bool_))
        hit = intersect_any(b, ro, rd)
        state, _ = shade_step(b, state, hit, k, nee=False, last=True)
        return state.radiance

    t0 = time.time()
    jax.block_until_ready(jax.jit(f)(bufs, jr.PRNGKey(0)))
    print(f"OK {time.time() - t0:.1f}s", flush=True)


def case_no_pallas():
    os.environ["LOUPIOTE_NO_PALLAS"] = "1"
    jax, jnp, cam, bufs = _env()
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths

    f = jax.jit(lambda b, k: trace_paths(b, cam, W, H, k, bounces=1,
                                         nee=False)[0])
    t0 = time.time()
    out = jax.block_until_ready(f(bufs, jr.PRNGKey(0)))
    nz = float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean())
    print(f"OK {time.time() - t0:.1f}s nonzero={nz:.3f}", flush=True)


CASES = {"rays_only": case_rays_only, "plus_decode": case_plus_decode,
         "plus_shade": case_plus_shade, "no_pallas": case_no_pallas}


def main():
    here = os.path.abspath(__file__)
    for name in CASES:
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, here, "--one", name],
                               capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)
            continue
        ok = [ln for ln in p.stdout.splitlines() if ln.startswith("OK")]
        sig = "SIGILL" if "SIGILL" in p.stdout + p.stderr else ""
        print(f"{name}: rc={p.returncode} {sig} "
              f"{ok[-1] if ok else ''} [{time.time() - t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        CASES[sys.argv[2]]()
    else:
        main()
