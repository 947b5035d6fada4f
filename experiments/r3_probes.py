"""Round-3 primitive probes (run each in its own subprocess: the tunneled
backend wedges after a few large executables).

Probes:
  repeat    — pltpu.repeat (8,4)->(8,128) segment broadcast (crashed Mosaic
              remote-compile in round 2; retry on current toolchain)
  bdim      — broadcast_in_dim (8,4)->(8,4,32) + reshape (same round-2 crash)
  seggather — take_along_axis with a CONSTANT segment index map
              (8,128)->(8,128): the workaround lowering for lane groups
  mxu       — jnp.dot (128,16)@(16,128) inside a while-loop kernel: is the
              MXU usable per traversal step (Woop triangle offload)?
  transpose — (8,128)->(128,8) in-kernel transpose cost (ray SoA -> matmul
              operand layout)

Each probe runs a fixed-step while loop so per-step cost is measurable.
Fresh inputs per timed call (the tunnel caches identical executions).

Usage: python experiments/r3_probes.py <probe> [steps]
       python experiments/r3_probes.py all   # subprocess per probe
"""

import functools
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUB, SUBP = 8, 128
STEPS = 30000  # enough steps to amortize the ~25-40ms tunnel dispatch


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def probe_body(name):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    if name == "repeat":
        def step(x, i):
            small = x[:, :4] + i.astype(jnp.float32)  # (8,4)
            big = pltpu.repeat(small, 32, axis=1)  # (8,128)
            return x + big * 1e-6
    elif name == "bdim":
        def step(x, i):
            small = x[:, :4] + i.astype(jnp.float32)  # (8,4)
            big = lax.broadcast_in_dim(small, (SUB, 4, 32),
                                       (0, 1)).reshape(SUB, SUBP)
            return x + big * 1e-6
    elif name == "seggather":
        def step(x, i):
            # 28 gathers/step models a 4-wide x 4-group slab fetch
            # (4 children x 7 fields).
            seg_idx = (lax.broadcasted_iota(jnp.int32, (SUB, SUBP), 1) >> 5)
            acc = x * 0.0
            for k in range(28):
                acc = acc + jnp.take_along_axis(x, (seg_idx + k) & 127,
                                                axis=1)
            return x + acc * 1e-7 + i.astype(jnp.float32) * 1e-9
    elif name == "seggather1":
        def step(x, i):
            seg_idx = (lax.broadcasted_iota(jnp.int32, (SUB, SUBP), 1) >> 5)
            return x + jnp.take_along_axis(x, seg_idx, axis=1) * 1e-7 \
                + i.astype(jnp.float32) * 1e-9
    elif name == "mxu":
        def step(x, i):
            # Models the Woop offload: rays (128,8) @ per-tri transform
            # columns (8,128) -> (128,128) outputs, fold 8 rows back.
            xt = x.T + i.astype(jnp.float32) * 1e-9  # (128,8)
            big = jnp.dot(xt, x, preferred_element_type=jnp.float32)
            return x + big[:SUB, :] * 1e-7
    elif name == "transpose":
        def step(x, i):
            xt = x.T  # (128, 8)
            return x + (xt.T) * 1e-7 + i.astype(jnp.float32) * 1e-9
    elif name == "selmerge":
        # Lane-group field broadcast, option C (8-wide rows, G=4):
        # 56 fields x (4 broadcasts + 3 group-mask selects). Models the
        # per-step extra cost of 4x32 lane-group sub-packets without a row
        # layout change.
        def step(x, i):
            lane = lax.broadcasted_iota(jnp.int32, (SUB, SUBP), 1)
            grp = lane >> 5
            xs = [x, x * 1.0000001, x * 1.0000002, x * 1.0000003]
            acc = x * 0.0
            for f in range(56):
                p = (f * 2) & 127
                cols = [lax.broadcast_in_dim(xs[g][:, p:p + 1],
                                             (SUB, SUBP), (0, 1))
                        for g in range(4)]
                v = cols[0]
                for g in range(1, 4):
                    v = jnp.where(grp == g, cols[g], v)
                acc = acc + v
            return x + acc * 1e-9 + i.astype(jnp.float32) * 1e-9
    elif name == "cgather28":
        # Lane-group option A (4-wide compact rows): 28 constant-index-map
        # take_along_axis gathers from one merged register.
        def step(x, i):
            lane = lax.broadcasted_iota(jnp.int32, (SUB, SUBP), 1)
            base = lane & ~jnp.int32(31)
            acc = x * 0.0
            for f in range(28):
                acc = acc + jnp.take_along_axis(x, base + f, axis=1)
            return x + acc * 1e-9 + i.astype(jnp.float32) * 1e-9
    elif name == "roll":
        # pltpu dynamic lane roll (rotated fetch alignment for option A).
        def step(x, i):
            sh = i & 127
            return x + pltpu.roll(x, sh, 1) * 1e-7
    elif name == "segmin":
        # Per-group (32-lane segment) min + broadcast back: 5 halving
        # shifted-min rounds via constant-map gathers + 1 seg broadcast.
        def step(x, i):
            lane = lax.broadcasted_iota(jnp.int32, (SUB, SUBP), 1)
            m = x + i.astype(jnp.float32) * 1e-9
            for sft in (1, 2, 4, 8, 16):
                idx = (lane & ~jnp.int32(31)) | ((lane + sft) & 31)
                m = jnp.minimum(m, jnp.take_along_axis(m, idx, axis=1))
            return x + m * 1e-9
    else:
        raise SystemExit(f"unknown probe {name}")
    return step


def run_probe(name, steps=STEPS):
    jax = _setup()
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    step = probe_body(name)

    def kernel(x_ref, o_ref):
        def body(c):
            x, i = c
            return step(x, i), i + 1

        def cond(c):
            return c[1] < steps

        out, _ = lax.while_loop(cond, body, (x_ref[0], jnp.int32(0)))
        o_ref[0] = out

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, SUB, SUBP),
                                   lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, SUB, SUBP), jnp.float32),
        )(x)

    x = jnp.asarray(np.random.default_rng(0).random(
        (1, SUB, SUBP), np.float32))
    t0 = time.time()
    out = run(x)
    jax.block_until_ready(out)
    np.asarray(out)  # force materialization (tunnel defers first exec)
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(5):
        xi = x + np.float32(i + 1)
        t0 = time.time()
        out = run(xi)
        jax.block_until_ready(out)
        np.asarray(out[0, 0, :4])
        best = min(best, time.time() - t0)
    return compile_s, best


def run_probe_slope(name):
    """Per-step cost as the SLOPE between two step counts — a single run is
    dominated by the ~25-40ms tunnel dispatch overhead."""
    s1, s2 = 30000, 230000
    c1, t1 = run_probe(name, s1)
    _, t2 = run_probe(name, s2)
    slope = (t2 - t1) / (s2 - s1)
    print(f"PROBE {name}: compile {c1:.1f}s, {slope * 1e9:.1f} ns/step "
          f"(slope {s1}->{s2}; raw {t1*1e3:.0f}/{t2*1e3:.0f} ms)",
          flush=True)


def run_sort_probe():
    """XLA-side glue costs for the binned pipelines: argsort at wave scale,
    take-gather, and segment_sum histogram."""
    jax = _setup()
    import jax.numpy as jnp

    for n in (2_000_000, 4_000_000, 8_000_000):
        keys = np.random.default_rng(0).integers(
            0, 4096, n, dtype=np.int32)
        f = jax.jit(lambda k: jnp.argsort(k))
        g = jax.jit(lambda k, o: (k[o], jax.ops.segment_sum(
            jnp.ones_like(k), k, num_segments=4096)))
        kj = jnp.asarray(keys)
        o = f(kj)
        jax.block_until_ready(o)
        np.asarray(o[:4])
        best_s = best_g = float("inf")
        for i in range(4):
            kj2 = jnp.asarray(keys ^ (i + 1))
            t0 = time.time()
            o = f(kj2)
            jax.block_until_ready(o)
            np.asarray(o[:4])
            best_s = min(best_s, time.time() - t0)
            t0 = time.time()
            r = g(kj2, o)
            jax.block_until_ready(r)
            np.asarray(r[0][:4])
            best_g = min(best_g, time.time() - t0)
        print(f"PROBE sort n={n}: argsort {best_s*1e3:.0f} ms, "
              f"gather+hist {best_g*1e3:.0f} ms", flush=True)


def run_chunked_sort_probe():
    """Global lax.sort vs chunked row sorts (cost ~ log^2(row length)) at
    pipeline-glue scale."""
    jax = _setup()
    import jax.numpy as jnp
    from jax import lax

    n = 8_388_608
    keys = np.random.default_rng(0).integers(0, 512, n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)

    def glob(k, v):
        return lax.sort((k, v), num_keys=1)

    def chunked(k, v, C):
        k2 = k.reshape(-1, C)
        v2 = v.reshape(-1, C)
        ks, vs = lax.sort((k2, v2), num_keys=1, dimension=1)
        return ks, vs

    for name, fn in (("global", jax.jit(glob)),
                     ("chunk4096", jax.jit(lambda k, v: chunked(k, v, 4096))),
                     ("chunk16384",
                      jax.jit(lambda k, v: chunked(k, v, 16384)))):
        best = float("inf")
        for i in range(4):
            kj = jnp.asarray(keys ^ (i + 1))
            vj = jnp.asarray(vals)
            t0 = time.time()
            o = fn(kj, vj)
            jax.block_until_ready(o)
            np.asarray(o[0].reshape(-1)[:4])
            if i:
                best = min(best, time.time() - t0)
        print(f"PROBE chunked_sort {name} n={n}: {best*1e3:.0f} ms",
              flush=True)


def run_perm_probe():
    """Applying a KNOWN permutation at wave scale: scatter (x.at[pos].set)
    vs gather (x[inv]) vs sort_key_val on the position key. If any of these
    beats the 672ms argsort, the MXU counting-rank regroup (one-hot f32
    matmuls + cumsum produce positions without sorting) unlocks the
    treelet pipeline's phase 2."""
    jax = _setup()
    import jax.numpy as jnp
    from jax import lax

    for n in (2_000_000, 8_388_608):
        rng = np.random.default_rng(0)
        pos = rng.permutation(n).astype(jnp.int32)
        vals = np.arange(n, dtype=np.int32)

        fns = {
            "scatter": jax.jit(lambda p, v: jnp.zeros_like(v).at[p].set(
                v, unique_indices=True, mode="drop")),
            "gather": jax.jit(lambda p, v: v[p]),
            "sortkv": jax.jit(lambda p, v: lax.sort((p, v), num_keys=1)[1]),
        }
        for name, f in fns.items():
            best = float("inf")
            try:
                for i in range(4):
                    pj = jnp.asarray(pos)
                    vj = jnp.asarray(vals ^ (i + 1))
                    t0 = time.time()
                    o = f(pj, vj)
                    jax.block_until_ready(o)
                    r = jax.tree_util.tree_leaves(o)[0]
                    np.asarray(r.reshape(-1)[:4])
                    if i:
                        best = min(best, time.time() - t0)
                print(f"PROBE perm {name} n={n}: {best*1e3:.0f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"PROBE perm {name} n={n}: FAILED {e}", flush=True)


def run_rank_probe():
    """MXU counting-rank glue cost: per-1024-chunk one-hot(64) f32 matmuls
    (strict-tril ranks + histogram), chunk-base cumsum, and position
    assembly — everything EXCEPT the final permutation apply."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as _np

    n = 8_388_608
    C = 1024
    B = 64
    keys = _np.random.default_rng(0).integers(0, B, n).astype(_np.int32)
    tril = _np.tril(_np.ones((C, C), _np.float32), k=-1)

    @jax.jit
    def positions(k):
        k2 = k.reshape(-1, C)  # (nc, C)
        oh = jax.nn.one_hot(k2, B, dtype=jnp.float32)  # (nc, C, B)
        ranks = jnp.einsum("ij,njb->nib", tril, oh,
                           preferred_element_type=jnp.float32)
        hist = oh.sum(axis=1)  # (nc, B)
        base = jnp.cumsum(hist, axis=0) - hist  # exclusive over chunks
        tot = hist.sum(axis=0)
        gbase = jnp.cumsum(tot) - tot  # (B,)
        pos = (jnp.take_along_axis(
            ranks, k2[:, :, None], axis=2)[:, :, 0]
            + jnp.take_along_axis(base + gbase[None, :],
                                  k2, axis=1))
        return pos.reshape(-1).astype(jnp.int32)

    kj = jnp.asarray(keys)
    o = positions(kj)
    jax.block_until_ready(o)
    np.asarray(o[:4])
    best = float("inf")
    for i in range(4):
        kj = jnp.asarray(_np.roll(keys, i + 1))
        t0 = time.time()
        o = positions(kj)
        jax.block_until_ready(o)
        np.asarray(o[:4])
        best = min(best, time.time() - t0)
    # Sanity: positions must be a permutation.
    chk = np.sort(np.asarray(positions(jnp.asarray(keys))))
    ok = bool((chk == np.arange(n)).all())
    print(f"PROBE rank64 n={n}: {best*1e3:.0f} ms perm_ok={ok}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "perm":
        run_perm_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "rank":
        run_rank_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "sort":
        run_sort_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "chunked_sort":
        run_chunked_sort_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        run_probe_slope(sys.argv[1])
        return
    here = os.path.abspath(__file__)
    for name in ("repeat", "bdim", "seggather1", "seggather", "mxu",
                 "transpose"):
        r = subprocess.run([sys.executable, here, name],
                           capture_output=True, text=True, timeout=900)
        line = [ln for ln in r.stdout.splitlines() if "PROBE" in ln]
        if line:
            print(line[-1], flush=True)
        else:
            tail = (r.stderr or r.stdout)[-400:]
            print(f"PROBE {name}: FAILED rc={r.returncode}: {tail}",
                  flush=True)


if __name__ == "__main__":
    main()
