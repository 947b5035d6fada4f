"""Stage 2 of the scan-TLAS fusion-crash bisect: the TLAS intersect alone
compiles (scan_crash_probe.py all-OK), so the SIGILL needs the full
trace_paths composition. Find which frame feature pulls the trigger.

Usage: python experiments/scan_crash_probe2.py            (ladder)
       python experiments/scan_crash_probe2.py --one b2_nee
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 256, 144

CASES = {
    "b1": dict(bounces=1, nee=False, textured=False),
    "b1_nee": dict(bounces=1, nee=True, textured=False),
    "b2": dict(bounces=2, nee=False, textured=False),
    "b2_nee": dict(bounces=2, nee=True, textured=False),
    "b2_nee_tex": dict(bounces=2, nee=True, textured=True),
    "b3_nee_tex": dict(bounces=3, nee=True, textured=True),
}


def run_one(name):
    cfg = CASES[name]
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene.instanced import build_instanced_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    cam = jnp.asarray(np.asarray(arch_camera()))
    scene = build_arch_scene(8_000, textured=cfg["textured"], props=200,
                             merged=True)
    bufs = build_instanced_buffers(scene)
    f = jax.jit(lambda b, k: trace_paths(b, cam, W, H, k,
                                         bounces=cfg["bounces"],
                                         nee=cfg["nee"])[0])
    t0 = time.time()
    out = jax.block_until_ready(f(bufs, jr.PRNGKey(0)))
    nz = float((np.asarray(out).reshape(-1, 3).sum(1) > 0).mean())
    print(f"OK compile+run {time.time() - t0:.1f}s nonzero={nz:.3f}",
          flush=True)


def main():
    here = os.path.abspath(__file__)
    for name in CASES:
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, here, "--one", name],
                               capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT 1800s", flush=True)
            continue
        ok = [ln for ln in p.stdout.splitlines() if ln.startswith("OK")]
        sig = "SIGILL" if "SIGILL" in p.stdout + p.stderr else ""
        last_err = (p.stderr.strip().splitlines() or [""])[-1][:120]
        print(f"{name}: rc={p.returncode} {sig} "
              f"{ok[-1] if ok else last_err} [{time.time() - t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
