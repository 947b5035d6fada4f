"""Decompose the wide kernel's per-step cost by stripping blocks.

Variants (results intentionally WRONG for stripped ones — timing only):
  full      — production kernel (chains=1)
  nomt      — leaf Moller-Trumbore unroll removed
  noorder   — rank ordering replaced by index order (no TN pairwise block)
  nostack   — stack scatter removed (descend-only; terminates early!)
  nofetch   — row fetch replaced by a constant row (loop shape kept by a
              fake data dependence; steps forced to a fixed count)
Run on the diffuse-sorted wave of the arch-260k scene.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from measure_traversal import build, make_waves  # noqa: E402

SUB, SUBP, WIDTH = 8, 128, 8
TILE = SUB * SUBP
BIG = 3e30
T_MIN = 1e-4


def _bc(col):
    return jax.lax.broadcast_in_dim(col, (SUB, SUBP), (0, 1))


def _rowsum(x):
    return jnp.sum(x, axis=1, keepdims=True)


def probe_kernel(rows_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t0_ref, act_ref, t_out, u_out, v_out, tri_out,
                 *, end_index, max_steps, leaf_cap, stack_size, probe):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0]
    t0 = t0_ref[0]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                               jnp.where(d >= 0, 1e-20, -1e-20))

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    END = jnp.int32(end_index)
    lane_s = lax.broadcasted_iota(jnp.int32, (SUB, stack_size), 1)
    c_iota = lax.broadcasted_iota(jnp.int32, (SUB, WIDTH), 1)

    def cond(c):
        steps = c[-1]
        done = c[2]
        if probe == "nofetch":
            return steps < max_steps
        return jnp.logical_and(jnp.sum(done) < SUB, steps < max_steps)

    def body(c):
        (cur, ptr, done, stack, t, u, v, tri, steps) = c
        if probe == "nofetch":
            # Fake data dependence on cur so the loop isn't hoisted.
            rows = [rows_ref[pl.ds(jnp.minimum(cur[s, 0] - cur[s, 0], 0), 1),
                             :] for s in range(SUB)]
        else:
            rows = [rows_ref[pl.ds(jnp.where(done[s, 0] > 0, 0, cur[s, 0]),
                                   1), :] for s in range(SUB)]
        rs = jnp.concatenate(rows, axis=0)

        kind = lax.bitcast_convert_type(rs[:, 127:128], jnp.int32)
        live = 1 - done
        is_leaf = (kind == 1).astype(jnp.int32) * live
        is_node = (1 - (kind == 1).astype(jnp.int32)) * live
        lane_act = (act > 0) & (_bc(done) == 0)

        fc = lax.bitcast_convert_type(rs[:, 126:127], jnp.int32)
        lcount = fc & 15
        lfirst = fc >> 4
        new_t, new_u, new_v, new_tri = t, u, v, tri
        leaf_lane = lane_act & (_bc(is_leaf) > 0)
        caps = 0 if probe == "nomt" else leaf_cap
        for k in range(caps):
            b = 9 * k
            p0x, p0y, p0z = (_bc(rs[:, b + i:b + i + 1]) for i in range(3))
            e1x, e1y, e1z = (_bc(rs[:, b + i:b + i + 1]) for i in range(3, 6))
            e2x, e2y, e2z = (_bc(rs[:, b + i:b + i + 1]) for i in range(6, 9))
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            valid = _bc(is_leaf * (k < lcount).astype(jnp.int32)) > 0
            ok = (valid & leaf_lane & (uu >= 0.0) & (vv >= 0.0)
                  & (uu + vv <= 1.0) & (tt > T_MIN) & (tt < new_t))
            new_t = jnp.where(ok, tt, new_t)
            new_u = jnp.where(ok, uu, new_u)
            new_v = jnp.where(ok, vv, new_v)
            new_tri = jnp.where(ok, _bc(lfirst) + k, new_tri)

        node_lane = lane_act & (_bc(is_node) > 0)
        hits, tmins, ptrs = [], [], []
        for ci in range(WIDTH):
            b = 16 * ci
            bminx, bminy, bminz = (_bc(rs[:, b + i:b + i + 1])
                                   for i in range(3))
            bmaxx, bmaxy, bmaxz = (_bc(rs[:, b + i:b + i + 1])
                                   for i in range(3, 6))
            cptr = lax.bitcast_convert_type(rs[:, b + 6:b + 7], jnp.int32)
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
            rhit = (tf >= jnp.maximum(tn, 0.0)) & (tn < new_t) & node_lane
            ctmin = jnp.min(jnp.where(rhit, tn, BIG), axis=1, keepdims=True)
            chit = ((ctmin < BIG) & (cptr >= 0)).astype(jnp.int32)
            hits.append(chit)
            tmins.append(ctmin)
            ptrs.append(cptr)
        H = jnp.concatenate(hits, axis=1)
        TN = jnp.concatenate(tmins, axis=1)
        P = jnp.concatenate(ptrs, axis=1)
        nchild = _rowsum(H)
        descend = (nchild > 0).astype(jnp.int32) * is_node

        def _bw(col):
            return jax.lax.broadcast_in_dim(col, (SUB, WIDTH), (0, 1))

        if probe == "noorder":
            rank = jnp.zeros((SUB, WIDTH), jnp.int32)
            for cp in range(WIDTH):
                if cp:
                    rank = rank + (c_iota >= cp).astype(jnp.int32) * _bw(
                        H[:, cp - 1:cp])
        else:
            rank = jnp.zeros((SUB, WIDTH), jnp.int32)
            for cp in range(WIDTH):
                tn_cp = TN[:, cp:cp + 1]
                nearer = ((_bw(tn_cp) < TN)
                          | ((_bw(tn_cp) == TN) & (cp < c_iota)))
                rank = rank + (nearer
                               & (_bw(H[:, cp:cp + 1]) > 0)).astype(jnp.int32)

        sel0 = H * (rank == 0).astype(jnp.int32)
        near_ptr = _rowsum(sel0 * P)

        if probe == "nostack":
            new_stack = stack
            pos = ptr
        else:
            push_c = H * (rank >= 1).astype(jnp.int32) * _bw(descend)
            pos_c = _bw(ptr) + _bw(nchild) - 1 - rank
            delta = jnp.zeros((SUB, stack_size), jnp.int32)
            written = jnp.zeros((SUB, stack_size), jnp.int32)
            for ci in range(WIDTH):
                onehot = ((lane_s == jax.lax.broadcast_in_dim(
                    pos_c[:, ci:ci + 1], (SUB, stack_size), (0, 1)))
                    & (jax.lax.broadcast_in_dim(
                        push_c[:, ci:ci + 1], (SUB, stack_size),
                        (0, 1)) > 0)).astype(jnp.int32)
                delta = delta + onehot * jax.lax.broadcast_in_dim(
                    P[:, ci:ci + 1], (SUB, stack_size), (0, 1))
                written = written + onehot
            new_stack = stack * (1 - written) + delta
            pos = ptr + descend * jnp.maximum(nchild - 1, 0)

        can_pop = (pos > 0).astype(jnp.int32)
        top = jax.lax.broadcast_in_dim(jnp.maximum(pos - 1, 0),
                                       (SUB, stack_size), (0, 1))
        popped = _rowsum(jnp.where(lane_s == top, new_stack, 0))
        nxt = jnp.where(descend > 0, near_ptr,
                        jnp.where(can_pop > 0, popped, END))
        new_ptr = jnp.where(descend > 0, pos, jnp.maximum(pos - 1, 0))
        fin = ((done > 0) | (nxt >= END)).astype(jnp.int32)
        new_cur = (1 - fin) * nxt
        return (new_cur, new_ptr, fin, new_stack,
                new_t, new_u, new_v, new_tri, steps + 1)

    init = (jnp.zeros((SUB, 1), jnp.int32), jnp.zeros((SUB, 1), jnp.int32),
            (jnp.sum(act, axis=1, keepdims=True) == 0).astype(jnp.int32),
            jnp.zeros((SUB, stack_size), jnp.int32), t0,
            jnp.zeros((SUB, SUBP), jnp.float32),
            jnp.zeros((SUB, SUBP), jnp.float32),
            jnp.full((SUB, SUBP), -1, jnp.int32), jnp.int32(0))
    out = lax.while_loop(cond, body, init)
    t_out[0] = out[4]
    u_out[0] = out[5]
    v_out[0] = out[6]
    tri_out[0] = out[7]


@functools.partial(jax.jit, static_argnames=("end_index", "max_steps",
                                             "leaf_cap", "stack_size",
                                             "probe"))
def probe_trace(trav_rows, ox, oy, oz, dx, dy, dz, t0, act, *, end_index,
                max_steps, leaf_cap, stack_size, probe):
    G = ox.shape[0]
    kernel = functools.partial(probe_kernel, end_index=end_index,
                               max_steps=max_steps, leaf_cap=leaf_cap,
                               stack_size=stack_size, probe=probe)
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec((1, SUB, SUBP), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
    )
    out_shape = [jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.float32)] * 3 + [
        jax.ShapeDtypeStruct((G, SUB, SUBP), jnp.int32)]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
    )(trav_rows, ox, oy, oz, dx, dy, dz, t0, act)


def main():
    from loupiote_tpu.ops.sort import ray_sort_key, sort_order

    bufs, cam = build()
    ro, rd, dro, drd, alive = make_waves(bufs, cam)
    lo, hi = bufs.node_min[0], bufs.node_max[0]
    key = ray_sort_key(jnp.asarray(dro), jnp.asarray(drd),
                       jnp.asarray(alive), lo, hi)
    order = np.asarray(sort_order(key))
    R = len(ro)
    G = R // TILE

    def shp(x):
        return jnp.asarray(x).reshape(G, SUB, SUBP)

    args = (bufs.trav_rows,
            shp(dro[order][:, 0]), shp(dro[order][:, 1]),
            shp(dro[order][:, 2]),
            shp(drd[order][:, 0]), shp(drd[order][:, 1]),
            shp(drd[order][:, 2]),
            shp(np.full(R, 1e30, np.float32)),
            shp(alive[order].astype(np.int32)))

    for probe in ("full", "nomt", "noorder", "nostack", "nofetch"):
        ms = 600 if probe == "nofetch" else 4 * bufs.wide_end + 64
        f = lambda *a: probe_trace(*a, end_index=bufs.wide_end,
                                   max_steps=ms, leaf_cap=bufs.leaf_cap,
                                   stack_size=bufs.wide_stack, probe=probe)
        out = f(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = f(*args)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        note = " (per-step x 600 fixed)" if probe == "nofetch" else ""
        print(f"{probe}: {best*1e3:.0f} ms{note}", flush=True)


if __name__ == "__main__":
    main()
