"""Per-lane gather traversal microbench (ROADMAP item 1 feasibility).

Each of 1024 lanes walks its OWN node sequence over a top-1024 table held
as (8,128) VMEM tiles, one gather-step per field per iteration:
    idx -> (sublane, lane); 8x (sublane-broadcast + take_along_axis + select)
Measures ns/step for a 1024-lane block stepping 7 fields (6 f32 bounds +
1 link word). If this lands at ~0.2-0.5 us/step, per-lane top traversal
beats the sub-packet kernel's ~1.2 us/step by >10x per ray-visit and the
treelet design is GO.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SUB, SUBP = 8, 128


def _gather_tile(table, idx_row, idx_lane):
    """Per-lane gather from one (8,128) tile. table: (8,128) value array."""
    out = jnp.zeros((SUB, SUBP), table.dtype)
    for s in range(SUB):
        row_b = lax.broadcast_in_dim(table[s:s + 1, :], (SUB, SUBP), (0, 1))
        g = jnp.take_along_axis(row_b, idx_lane, axis=1)
        out = jnp.where(idx_row == s, g, out)
    return out


def _kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            out_ref, *, steps: int):
    # tab: (7, 8, 128): minx,miny,minz,maxx,maxy,maxz,link(u32 hit|miss<<16)
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    def body(i, carry):
        cur, acc = carry  # (8,128) i32 node ids, f32 accum
        row = cur >> 7
        lane = cur & 127
        bminx = _gather_tile(tab_ref[0], row, lane)
        bminy = _gather_tile(tab_ref[1], row, lane)
        bminz = _gather_tile(tab_ref[2], row, lane)
        bmaxx = _gather_tile(tab_ref[3], row, lane)
        bmaxy = _gather_tile(tab_ref[4], row, lane)
        bmaxz = _gather_tile(tab_ref[5], row, lane)
        link = lax.bitcast_convert_type(_gather_tile(tab_ref[6], row, lane),
                                        jnp.int32)

        t1x = (bminx - ox) * ix
        t2x = (bmaxx - ox) * ix
        t1y = (bminy - oy) * iy
        t2y = (bmaxy - oy) * iy
        t1z = (bminz - oz) * iz
        t2z = (bmaxz - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                     jnp.minimum(t1y, t2y)),
                         jnp.minimum(t1z, t2z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                     jnp.maximum(t1y, t2y)),
                         jnp.maximum(t1z, t2z))
        hit = tf >= jnp.maximum(tn, 0.0)
        nxt = jnp.where(hit, link & 0xFFFF, (link >> 16) & 0xFFFF)
        return nxt & 1023, acc + tn
    cur0 = lax.broadcasted_iota(jnp.int32, (SUB, SUBP), 1)
    _, acc = lax.fori_loop(0, steps, body,
                           (cur0, jnp.zeros((SUB, SUBP), jnp.float32)))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("steps",))
def run(tab, ox, oy, oz, dx, dy, dz, *, steps):
    G = ox.shape[0]
    kernel = functools.partial(_kernel, steps=steps)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(tab, ox, oy, oz, dx, dy, dz)


def main():
    rng = np.random.default_rng(3)
    tab = rng.random((7, 8, 128), np.float32)
    links = (rng.integers(0, 1024, (8, 128)).astype(np.uint32)
             | (rng.integers(0, 1024, (8, 128)).astype(np.uint32) << 16))
    tab[6] = links.view(np.float32)
    G = 128  # 128 blocks x 1024 lanes
    shp = (G, SUB, SUBP)
    ox, oy, oz = (rng.random(shp, np.float32) for _ in range(3))
    dx, dy, dz = (rng.random(shp, np.float32) - 0.5 for _ in range(3))
    args = [jnp.asarray(a) for a in (tab, ox, oy, oz, dx, dy, dz)]

    times = {}
    for steps in (64, 512, 4096):
        out = run(*args, steps=steps)
        jax.block_until_ready(out)
        best = float("inf")
        for i in range(4):
            # fresh input per call (i+1: i=0 would replay the warmup input
            # and hit the tunnel's execution cache)
            args[1] = jnp.asarray(ox + np.float32(i + 1) * 1e-5)
            t0 = time.time()
            out = run(*args, steps=steps)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        times[steps] = best
        print(f"steps={steps}: {best*1e3:.1f} ms total  "
              f"(checksum {float(jnp.sum(out)):.4e})", flush=True)
    # Slope removes launch/dispatch overhead.
    per_step = (times[4096] - times[512]) / (4096 - 512) / G
    print(f"per-lane step (7-field gather + slab + control, 1024 lanes): "
          f"{per_step*1e9:.0f} ns", flush=True)
    print(f"=> per ray-visit: {per_step*1e9/1024:.3f} ns "
          f"(sub-packet kernel effective: ~1.2us/step / ~10 useful lanes)")


if __name__ == "__main__":
    main()
