"""Attribute the full-frame time beyond the traversal kernels.

BENCH r4 mid: frame 1917 ms, measured waves (primary 110 + 2x diffuse
~600 + 3x shadow ~640) ~ 1350 ms -> ~570 ms of sort glue + shading +
raygen + gbuffer. This times frame variants that toggle one ingredient
each:

  full        bounces=3, NEE, sorted     (the headline frame)
  nosort      sort_rays=False            -> sort glue cost
  nonee       nee=False                  -> NEE shadow waves + light math
  b1 / b2     bounces=1 / 2              -> per-bounce increments

The tunneled backend wedges with INVALID_ARGUMENT once several large
pallas executables are loaded in one process (the round-4 first attempt
died exactly there, artifacts/r4_device/frame_parts.log), so each
variant runs in its OWN subprocess — same scheme as bench.py. The
variants are no longer same-window interleaved; each child reports its
own best-of-4 and the parent prints the deltas.

Usage: python experiments/frame_parts.py            (parent, runs all)
       python experiments/frame_parts.py --one full (child, one config)
"""

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1920, 1080

CFGS = {"full": dict(bounces=3, nee=True, sort_rays=True),
        "nosort": dict(bounces=3, nee=True, sort_rays=False),
        "nonee": dict(bounces=3, nee=False, sort_rays=True),
        "b2": dict(bounces=2, nee=True, sort_rays=True),
        "b1": dict(bounces=1, nee=True, sort_rays=True)}


def run_one(name):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.random as jr

    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene import build_scene_buffers
    from loupiote_tpu.scene.procedural import arch_camera, build_arch_scene

    kw = CFGS[name]
    bufs = build_scene_buffers(build_arch_scene(260_000))
    cam = jnp.asarray(np.asarray(arch_camera()))
    fn = jax.jit(functools.partial(
        lambda b, k, kw: trace_paths(b, cam, WIDTH, HEIGHT, k, **kw)[0],
        kw=kw))
    t0 = time.time()
    jax.block_until_ready(fn(bufs, jr.PRNGKey(1)))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(4):
        # The tunnel sporadically throws a transient INVALID_ARGUMENT on
        # re-execute; retry so one flake doesn't void the whole variant.
        for attempt in range(3):
            try:
                t0 = time.time()
                jax.block_until_ready(fn(bufs, jr.PRNGKey(10 + i)))
                best = min(best, time.time() - t0)
                break
            except Exception as e:  # noqa: BLE001 — tunnel flake, retried
                print(f"  flake {name}[{i}]: {repr(e)[:80]}", flush=True)
                time.sleep(5)
    print(json.dumps({"name": name, "ms": round(best * 1e3, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    best = {}
    for name in CFGS:
        # A congested compile window can stall a child >18 min; skip that
        # variant and keep the rest instead of aborting the whole run.
        try:
            p = subprocess.run([sys.executable, os.path.abspath(__file__),
                                "--one", name],
                               capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"{name}: FAILED(timeout 1800s)", flush=True)
            continue
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"{name}: FAILED rc={p.returncode} "
                  f"{p.stderr.strip().splitlines()[-1][:120] if p.stderr.strip() else ''}",
                  flush=True)
            continue
        rec = json.loads(line[-1])
        best[name] = rec["ms"]
        print(f"{name:>7}: {rec['ms']:7.1f} ms (compile {rec['compile_s']}s)",
              flush=True)
    if "full" in best and "nosort" in best:
        print(f"sort glue  = full - nosort = "
              f"{best['full'] - best['nosort']:+.1f} ms", flush=True)
    if "full" in best and "nonee" in best:
        print(f"NEE total  = full - nonee  = "
              f"{best['full'] - best['nonee']:+.1f} ms", flush=True)
    if "b2" in best and "b1" in best:
        print(f"bounce increment b1->b2 = {best['b2'] - best['b1']:+.1f} ms",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
