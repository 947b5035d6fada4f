"""Bisect the XLA:TPU priority-fusion SIGILL triggered by the scan TLAS.

The 1080p instanced bench crashed the remote compile helper inside
TpuPriorityFusionQueue (artifacts/r5_device2/bench_instanced.log), and a
small-scale repro crashed identically even with the Pallas kernel
removed from the scan body (XLA packet path only). This ladder isolates
the trigger; each case compiles in its own subprocess (tunnel rule).

Cases:
  tlas      full instanced intersect (hall unrolled wide + props scan)
  noprobe   props-only scene (no big hall mesh in the program)
  minimal   hand-built scan over intersect_packets on one tiny mesh
  chunk8    like minimal but 8-long scans x 13 (chunked)
  nowhile   scan body with the while-loop traversal replaced by a fixed
            4-step unrolled traversal (loop-in-scan removed)

Usage: python experiments/scan_crash_probe.py          (all cases)
       python experiments/scan_crash_probe.py --one minimal
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 36 * 1024


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _scene(props=200, merged=True, tris=8_000):
    from loupiote_tpu.scene.instanced import build_instanced_buffers
    from loupiote_tpu.scene.procedural import build_arch_scene

    scene = build_arch_scene(tris, textured=False, props=props,
                             merged=merged)
    if not merged:
        scene.instances = scene.instances[-props:]  # props only
    return build_instanced_buffers(scene)


def _rays(jnp):
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.random((R, 3), np.float32) * 30 - 15)
    rd = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


def case_tlas():
    jax = _setup()
    import jax.numpy as jnp

    from loupiote_tpu.ops.intersect import intersect_any

    bufs = _scene()
    ro, rd = _rays(jnp)
    t0 = time.time()
    out = jax.block_until_ready(
        jax.jit(lambda b, a, c: intersect_any(b, a, c).t)(bufs, ro, rd))
    print(f"OK compile+run {time.time() - t0:.1f}s "
          f"hits={(float((out < 1e30).mean())):.3f}", flush=True)


def case_noprobe():
    jax = _setup()
    import jax.numpy as jnp

    from loupiote_tpu.ops.intersect import intersect_any

    bufs = _scene(merged=False)
    ro, rd = _rays(jnp)
    t0 = time.time()
    out = jax.block_until_ready(
        jax.jit(lambda b, a, c: intersect_any(b, a, c).t)(bufs, ro, rd))
    print(f"OK compile+run {time.time() - t0:.1f}s "
          f"hits={(float((out < 1e30).mean())):.3f}", flush=True)


def _minimal(chunk):
    jax = _setup()
    import jax.numpy as jnp

    from loupiote_tpu.ops.intersect import intersect_packets
    from loupiote_tpu.scene import Scene, build_scene_buffers
    from loupiote_tpu.scene.types import Instance, Mesh

    rng = np.random.default_rng(1)
    s = Scene.default()
    v = rng.random((30, 3), np.float32) * 2
    idx = rng.integers(0, 30, (20, 3)).astype(np.uint32).reshape(-1)
    s.meshes.append(Mesh(v, None, None, idx))
    s.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    blas = build_scene_buffers(s)
    ro, rd = _rays(jnp)
    offs = jnp.asarray(rng.random((104, 3), np.float32) * 20 - 10)

    def body(c, o):
        hit = intersect_packets(blas, ro - o[None, :], rd, tmax=c)
        return jnp.minimum(c, hit.t), None

    @jax.jit
    def run(t0v):
        c = t0v
        if chunk:
            for i in range(0, 104, 8):
                c, _ = jax.lax.scan(body, c, offs[i:i + 8])
        else:
            c, _ = jax.lax.scan(body, c, offs)
        return c

    t0 = time.time()
    out = jax.block_until_ready(run(jnp.full(R, 1e30)))
    print(f"OK compile+run {time.time() - t0:.1f}s "
          f"hits={(float((out < 1e30).mean())):.3f}", flush=True)


def case_minimal():
    _minimal(chunk=False)


def case_chunk8():
    _minimal(chunk=True)


def case_nowhile():
    jax = _setup()
    import jax.numpy as jnp

    from loupiote_tpu.ops.intersect import T_MIN

    rng = np.random.default_rng(1)
    tri = jnp.asarray(rng.random((16, 3, 3), np.float32) * 2)
    ro, rd = _rays(jnp)
    offs = jnp.asarray(rng.random((104, 3), np.float32) * 20 - 10)

    def mt(o, d, p0, e1, e2, t):
        pv = jnp.cross(d, e2)
        det = jnp.sum(e1 * pv, -1)
        ivd = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tv = o - p0
        uu = jnp.sum(tv * pv, -1) * ivd
        qv = jnp.cross(tv, e1)
        vv = jnp.sum(d * qv, -1) * ivd
        tt = jnp.sum(e2 * qv, -1) * ivd
        ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > T_MIN) & (tt < t)
        return jnp.where(ok, tt, t)

    def body(c, o):
        t = c
        for k in range(16):  # fixed unroll, no while loop
            p0 = tri[k, 0][None]
            e1 = (tri[k, 1] - tri[k, 0])[None]
            e2 = (tri[k, 2] - tri[k, 0])[None]
            t = mt(ro - o[None, :], rd, p0, e1, e2, t)
        return t, None

    @jax.jit
    def run(t0v):
        c, _ = jax.lax.scan(body, t0v, offs)
        return c

    t0 = time.time()
    out = jax.block_until_ready(run(jnp.full(R, 1e30)))
    print(f"OK compile+run {time.time() - t0:.1f}s "
          f"hits={(float((out < 1e30).mean())):.3f}", flush=True)


CASES = {"tlas": case_tlas, "noprobe": case_noprobe,
         "minimal": case_minimal, "chunk8": case_chunk8,
         "nowhile": case_nowhile}


def main():
    here = os.path.abspath(__file__)
    for name in ("minimal", "nowhile", "chunk8", "noprobe", "tlas"):
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, here, "--one", name],
                               capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT 1800s", flush=True)
            continue
        ok = [ln for ln in p.stdout.splitlines() if ln.startswith("OK")]
        sig = "SIGILL" if "SIGILL" in p.stdout + p.stderr else ""
        print(f"{name}: rc={p.returncode} {sig} "
              f"{ok[-1] if ok else (p.stderr.strip().splitlines() or [''])[-1][:120]} "
              f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        CASES[sys.argv[2]]()
    else:
        main()
