"""Device-side scene buffers: the TPU analog of ``SceneGPU``.

The reference uploads instances/materials/BVH nodes/BVH tris/vertices/lights
as storage buffers + a texture atlas (`crates/lib/src/scene.rs:123-188`).
Here scene upload = flatten every instance to world space, build ONE global
threaded BVH over the whole triangle soup (see accel/bvh.py for why), and
ship flat float32/int32 jax arrays to HBM as a frozen pytree.

All leading dimensions are padded to multiples of 128 so downstream kernels
see lane-aligned shapes and recompiles are bucketed.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..accel.bvh import FlatBVH, build_bvh
from .atlas import pack_atlas
from .hdr import Probe
from .types import INVALID_INDEX, Scene, pad_rows

_PAD = 128


def _ceil_to(n: int, m: int = _PAD) -> int:
    return max(((n + m - 1) // m) * m, m)


@struct.dataclass
class SceneBuffers:
    """Frozen pytree of HBM-resident flat arrays (SceneGPU analog)."""

    # Triangles, reordered to match BVH leaves. (T, 3)/(T, 2) float32.
    tri_p0: jnp.ndarray
    tri_e1: jnp.ndarray  # p1 - p0 (Moller-Trumbore precompute)
    tri_e2: jnp.ndarray  # p2 - p0
    tri_n0: jnp.ndarray
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_mat: jnp.ndarray  # (T,) int32 material id
    tri_inst: jnp.ndarray  # (T,) int32 instance id (gbuffer mesh id)

    # Threaded BVH (accel/bvh.py layout).
    node_min: jnp.ndarray  # (N, 3) float32
    node_max: jnp.ndarray  # (N, 3) float32
    node_first: jnp.ndarray  # (N,) int32
    node_count: jnp.ndarray  # (N,) int32
    node_miss: jnp.ndarray  # (N,) int32

    # Materials (M,...) — layout mirrors albedo_rtx Material fields.
    mat_color: jnp.ndarray  # (M, 4) float32
    mat_roughness: jnp.ndarray  # (M,) float32
    mat_metallic: jnp.ndarray  # (M,) float32 ("reflectivity")
    mat_albedo_tex: jnp.ndarray  # (M,) int32, -1 = none
    mat_mra_tex: jnp.ndarray  # (M,) int32, -1 = none
    mat_emission: jnp.ndarray  # (M, 3) float32

    # Quad area lights (L,...).
    light_origin: jnp.ndarray  # (L, 3)
    light_eu: jnp.ndarray  # (L, 3)
    light_ev: jnp.ndarray  # (L, 3)
    light_emission: jnp.ndarray  # (L, 3), premultiplied by intensity

    # Texture atlas.
    atlas: jnp.ndarray  # (layers, S, S, 4) uint8
    atlas_blocks: jnp.ndarray  # (K, 5) int32

    # Environment probe (zeros-shaped placeholders when absent).
    probe: jnp.ndarray  # (Hp, Wp, 3) float32
    probe_cdf_cond: jnp.ndarray  # (Hp, Wp) float32
    probe_cdf_marg: jnp.ndarray  # (Hp,) float32
    probe_pdf: jnp.ndarray  # (Hp, Wp) float32

    # Packed gather-friendly copies for the traversal hot loop: one row
    # gather per step instead of five (ops/intersect.py).
    # node_pack: [min.xyz, max.xyz, first, count, miss, right, pad, pad]
    # (ints bitcast to f32)
    node_pack: jnp.ndarray = None  # (N, 12) float32

    # Pallas row layout (ops/pallas_intersect.py): node_rows lanes =
    # [min.xyz, max.xyz, count, miss, right|leaf_row, axis|global_first,
    #  pad x6] (ints bitcast); leaf_rows = 14 tris x [p0, e1, e2] + 2 pad.
    node_rows: jnp.ndarray = None  # (N, 16) float32
    leaf_rows: jnp.ndarray = None  # (L, 128) float32
    num_leaves: int = struct.field(pytree_node=False, default=0)
    # Actual max triangles per leaf (<= LEAF_MAX): the Pallas kernel unrolls
    # its Moller-Trumbore loop only this far.
    leaf_cap: int = struct.field(pytree_node=False, default=14)

    # Wide (8-ary) unified traversal table (accel/wide.py): the primary
    # TPU traversal structure (ops/pallas_wide.py). Row = 8 child AABBs
    # (internal) or 14 triangles (leaf); root = row 0.
    trav_rows: jnp.ndarray = None  # (W + L, 128) float32
    wide_end: int = struct.field(pytree_node=False, default=0)
    wide_stack: int = struct.field(pytree_node=False, default=64)
    wide_width: int = struct.field(pytree_node=False, default=8)
    wide_leaf_rows: int = struct.field(pytree_node=False, default=1)

    # Shading attribute packs: ONE row gather per hit instead of ~11
    # (gathers cost ~row-count, not row-width, on TPU).
    # tri_shade: [n0(3), n1(3), n2(3), uv0(2), uv1(2), uv2(2), mat, inst,
    #             geometric_normal(3)]
    tri_shade: jnp.ndarray = None  # (T, 20) float32 (ints bitcast)
    # mat_pack: [color(4), roughness, metallic, emission(3), albedo_tex,
    #            mra_tex] (tex ids bitcast)
    mat_pack: jnp.ndarray = None  # (M, 11) float32
    # tri_pack: [p0.xyz, e1.xyz, e2.xyz]
    tri_pack: jnp.ndarray = None  # (T, 9) float32

    # Treelet pipeline tables (archived: experiments/treelet/pipeline.py,
    # CLOSED by round-4 device measurement). None in every default config;
    # populated only by the LOUPIOTE_TREELET=1 archive hook below.
    treelet: object = None

    # Two-level BLAS/TLAS instancing (scene/instanced.py): per-mesh BLAS
    # buffers shared by all instances + per-instance transforms. When
    # ``inst_w2o`` is set, traversal routes through intersect_instanced and
    # the flattened node/trav tables above are placeholder-sized.
    # Reference: BLASArray::{add_bvh,add_instance}
    # (`/root/reference/crates/lib/src/scene.rs:43-49`).
    blas: tuple = None  # tuple[SceneBuffers] per unique mesh
    inst_w2o: jnp.ndarray = None  # (K, 4, 4) world-to-object
    inst_nmat: jnp.ndarray = None  # (K, 3, 3) normal matrix (o2w^-T)
    inst_mat_id: jnp.ndarray = None  # (K,) int32 material per instance
    inst_tri_base: jnp.ndarray = None  # (K,) int32 global-tri offset
    inst_mesh: tuple = struct.field(pytree_node=False, default=None)
    # Per-instance world-space AABBs: the TLAS cull tables. The scan-mode
    # TLAS (instanced.py) slab-tests every ray against an instance's box
    # before entering its BLAS, so rays that miss the box retire in one
    # step instead of a full traversal.
    inst_aabb_lo: jnp.ndarray = None  # (K, 3) float32
    inst_aabb_hi: jnp.ndarray = None  # (K, 3) float32

    # Static metadata (not traced).
    num_tris: int = struct.field(pytree_node=False, default=0)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    # Traversal stack size: bucketed power-of-two >= bvh_max_depth + 2, so
    # the packet/Pallas stacks can never overflow (silent subtree drops).
    stack_depth: int = struct.field(pytree_node=False, default=64)
    num_lights: int = struct.field(pytree_node=False, default=0)
    has_probe: bool = struct.field(pytree_node=False, default=False)
    has_textures: bool = struct.field(pytree_node=False, default=False)
    end_index: int = struct.field(pytree_node=False, default=0)


def build_scene_buffers(scene: Scene, probe: Optional[Probe] = None,
                        atlas_size: int = 2048,
                        leaf_max: Optional[int] = None,
                        treelets: Optional[bool] = None) -> SceneBuffers:
    """Flatten + BVH-build + upload (SceneGPU::new_from_scene analog)."""
    p0s, p1s, p2s = [], [], []
    n0s, n1s, n2s = [], [], []
    uv0s, uv1s, uv2s = [], [], []
    mats, insts = [], []

    for inst_id, inst in enumerate(scene.instances):
        mesh = scene.meshes[inst.mesh_index]
        m = inst.model_to_world
        pos = mesh.positions @ m[:3, :3].T + m[:3, 3]
        if mesh.normals is not None:
            nrm_mat = np.linalg.inv(m[:3, :3]).T
            nrm = mesh.normals @ nrm_mat.T
            nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
        else:
            nrm = None
        idx = mesh.indices.reshape(-1, 3).astype(np.int64)
        a, b, c = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
        p0s.append(a)
        p1s.append(b)
        p2s.append(c)
        if nrm is None:
            # Facet normals when the mesh has none (binary loader semantics).
            fn = np.cross(b - a, c - a)
            fn = fn / np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-20)
            n0s.append(fn)
            n1s.append(fn)
            n2s.append(fn)
        else:
            n0s.append(nrm[idx[:, 0]])
            n1s.append(nrm[idx[:, 1]])
            n2s.append(nrm[idx[:, 2]])
        if mesh.texcoords is not None:
            uv = mesh.texcoords
            uv0s.append(uv[idx[:, 0]])
            uv1s.append(uv[idx[:, 1]])
            uv2s.append(uv[idx[:, 2]])
        else:
            z = np.zeros((len(idx), 2), np.float32)
            uv0s.append(z)
            uv1s.append(z)
            uv2s.append(z)
        mat_id = inst.material_index
        if mat_id == int(INVALID_INDEX) or mat_id >= len(scene.materials):
            mat_id = 0
        mats.append(np.full(len(idx), mat_id, np.int32))
        insts.append(np.full(len(idx), inst_id, np.int32))

    if not p0s:
        # Empty scene: a single degenerate triangle far away keeps every
        # kernel shape valid (the reference's default BLAS entry analog,
        # scene.rs:43-49).
        far = np.full((1, 3), 1e30, np.float32)
        p0s, p1s, p2s = [far], [far], [far]
        up = np.array([[0, 1, 0]], np.float32)
        n0s, n1s, n2s = [up], [up], [up]
        z = np.zeros((1, 2), np.float32)
        uv0s, uv1s, uv2s = [z], [z], [z]
        mats, insts = [np.zeros(1, np.int32)], [np.zeros(1, np.int32)]

    p0 = np.concatenate(p0s).astype(np.float32)
    p1 = np.concatenate(p1s).astype(np.float32)
    p2 = np.concatenate(p2s).astype(np.float32)
    from ..accel.bvh import LEAF_MAX as _LM

    bvh: FlatBVH = build_bvh(p0, p1, p2, leaf_max=min(leaf_max or _LM, _LM))
    order = bvh.tri_order

    from ..accel.bvh import bvh_max_depth

    depth = bvh_max_depth(bvh.count, bvh.miss)
    stack_depth = 64
    while stack_depth < depth + 2:
        stack_depth *= 2

    def cat(parts):
        return np.concatenate(parts).astype(np.float32)[order]

    p0, p1, p2 = p0[order], p1[order], p2[order]
    n0, n1, n2 = cat(n0s), cat(n1s), cat(n2s)
    uv0, uv1, uv2 = cat(uv0s), cat(uv1s), cat(uv2s)
    tri_mat = np.concatenate(mats)[order]
    tri_inst = np.concatenate(insts)[order]

    T = p0.shape[0]
    Tp = _ceil_to(T)
    N = bvh.num_nodes
    Np = _ceil_to(N)

    # Padding triangles: degenerate (e1 = e2 = 0) never hits.
    def padt(a, fill=0.0):
        return pad_rows(a, Tp, fill)

    node_min = pad_rows(bvh.node_min, Np, 1e30)
    node_max = pad_rows(bvh.node_max, Np, -1e30)
    node_first = pad_rows(bvh.first, Np, 0)
    node_count = pad_rows(bvh.count, Np, 0)
    node_miss = pad_rows(bvh.miss, Np, N)

    # Materials.
    M = max(len(scene.materials), 1)
    Mp = _ceil_to(M, 8)
    mat_color = np.ones((Mp, 4), np.float32)
    mat_roughness = np.ones(Mp, np.float32)
    mat_metallic = np.zeros(Mp, np.float32)
    mat_albedo_tex = np.full(Mp, -1, np.int32)
    mat_mra_tex = np.full(Mp, -1, np.int32)
    mat_emission = np.zeros((Mp, 3), np.float32)
    for i, mt in enumerate(scene.materials):
        mat_color[i] = mt.color
        mat_roughness[i] = mt.roughness
        mat_metallic[i] = mt.reflectivity
        mat_albedo_tex[i] = -1 if mt.albedo_texture == int(INVALID_INDEX) else mt.albedo_texture
        mat_mra_tex[i] = -1 if mt.mra_texture == int(INVALID_INDEX) else mt.mra_texture
        mat_emission[i] = mt.emission

    # Lights.
    L = max(len(scene.lights), 1)
    Lp = _ceil_to(L, 8)
    light_origin = np.zeros((Lp, 3), np.float32)
    light_eu = np.zeros((Lp, 3), np.float32)
    light_ev = np.zeros((Lp, 3), np.float32)
    light_emission = np.zeros((Lp, 3), np.float32)
    for i, lt in enumerate(scene.lights):
        light_origin[i] = lt.origin
        light_eu[i] = lt.edge_u
        light_ev[i] = lt.edge_v
        light_emission[i] = lt.emission * lt.intensity

    atlas = pack_atlas(scene.images, atlas_size)

    e1 = (p1 - p0).astype(np.float32)
    e2 = (p2 - p0).astype(np.float32)
    node_right = pad_rows(bvh.right, Np, -1)
    node_axis = pad_rows(bvh.axis, Np, -1)
    pad_col = np.zeros((Np, 1), np.float32)
    node_pack = np.concatenate([
        node_min, node_max,
        node_first.astype(np.int32).view(np.float32)[:, None],
        node_count.astype(np.int32).view(np.float32)[:, None],
        node_miss.astype(np.int32).view(np.float32)[:, None],
        node_right.astype(np.int32).view(np.float32)[:, None],
        node_axis.astype(np.int32).view(np.float32)[:, None],
        pad_col,
    ], axis=1).astype(np.float32)
    tri_pack = np.concatenate([padt(p0, 1e30), padt(e1), padt(e2)], axis=1)

    # --- Pallas row tables (see SceneBuffers docfields). Leaf l -> row l
    # holding its <=14 triangles; nodes reference leaf rows + global first.
    from ..accel.bvh import LEAF_MAX as _LEAF_ROW_CAP

    is_leaf = bvh.count > 0
    leaf_row_of_node = np.cumsum(is_leaf) - 1  # valid where is_leaf
    L = int(is_leaf.sum())
    leaf_rows = np.zeros((max(L, 1), 128), np.float32)
    leaf_ids = np.nonzero(is_leaf)[0]
    tri9 = np.concatenate([p0, e1, e2], axis=1)  # (T, 9) unpadded
    for li, nd in enumerate(leaf_ids):
        f, c = int(bvh.first[nd]), int(bvh.count[nd])
        c = min(c, _LEAF_ROW_CAP)
        block = tri9[f:f + c].reshape(-1)
        leaf_rows[li, :block.size] = block
        # Degenerate padding for empty slots: p0 far away, e1 = e2 = 0
        # (already zero) never hits.
        for k in range(c, _LEAF_ROW_CAP):
            leaf_rows[li, 9 * k: 9 * k + 3] = 1e30

    def _i32col(v):
        return v.astype(np.int32).view(np.float32)[:, None]

    geo_n = np.cross(p1 - p0, p2 - p0)
    geo_n = geo_n / np.maximum(np.linalg.norm(geo_n, axis=1, keepdims=True), 1e-20)
    tri_shade = np.concatenate([
        padt(n0), padt(n1), padt(n2),
        pad_rows(uv0, Tp), pad_rows(uv1, Tp), pad_rows(uv2, Tp),
        pad_rows(tri_mat, Tp, 0).astype(np.int32).view(np.float32)[:, None],
        pad_rows(tri_inst, Tp, -1).astype(np.int32).view(np.float32)[:, None],
        padt(geo_n.astype(np.float32)),
    ], axis=1).astype(np.float32)
    mat_pack = np.concatenate([
        mat_color,
        mat_roughness[:, None], mat_metallic[:, None],
        mat_emission,
        mat_albedo_tex.view(np.float32)[:, None],
        mat_mra_tex.view(np.float32)[:, None],
    ], axis=1).astype(np.float32)

    slot8 = np.where(is_leaf, leaf_row_of_node, bvh.right)
    slot9 = np.where(is_leaf, bvh.first, bvh.axis)
    node_rows = np.concatenate([
        bvh.node_min, bvh.node_max,
        _i32col(bvh.count), _i32col(bvh.miss),
        _i32col(slot8), _i32col(slot9),
        np.zeros((N, 6), np.float32),
    ], axis=1).astype(np.float32)
    node_rows = pad_rows(node_rows, Np, 0.0)
    # Padded rows: empty boxes (min > max) that never hit.
    node_rows[N:, 0:3] = 1e30
    node_rows[N:, 3:6] = -1e30

    # Wide unified traversal table (accel/wide.py). Width 16 (two-row
    # nodes, ~16% fewer steps in sim) is opt-in while device A/Bs
    # accumulate: LOUPIOTE_WIDE16=1.
    import os as _os

    from ..accel.wide import collapse_wide

    wide_width = 16 if _os.environ.get("LOUPIOTE_WIDE16") == "1" else 8
    wide_leaf_rows = int(_os.environ.get("LOUPIOTE_LEAF_ROWS", "1"))
    wide = collapse_wide(bvh, tri9, width=wide_width,
                         leaf_rows=wide_leaf_rows)
    trav = wide.trav_rows
    # +2: row[end_index] must exist — the kernel parks retiring rows with a
    # pending leaf on it (an inert internal row) until the final flush —
    # and the width-16 kernel unconditionally fetches row[fidx + 1].
    Wp = _ceil_to(trav.shape[0] + 2, 8)
    trav = pad_rows(trav, Wp, 0.0)
    # Padded rows read as internal nodes with all-empty children.
    for c in range(8):
        trav[wide.end_index:, 16 * c:16 * c + 3] = 1e30
        trav[wide.end_index:, 16 * c + 3:16 * c + 6] = -1e30
        trav[wide.end_index:, 16 * c + 6] = np.int32(-1).view(np.float32)
    wide_stack = 16
    while wide_stack < wide.stack_need:
        wide_stack *= 2

    # Treelet tables (archived two-phase per-lane pipeline — CLOSED, see
    # experiments/treelet/__init__.py for the round-4 device verdict). The
    # build hook remains only so the archived A/B benches re-run; it
    # requires LOUPIOTE_TREELET=1 AND the repo root on sys.path.
    import os as _os

    if treelets is None:
        treelets = (_os.environ.get("LOUPIOTE_TREELET") == "1"
                    and N >= 8192)
    treelet_dev = None
    if treelets:
        from experiments.treelet.pipeline import build_treelet_device

        treelet_dev = build_treelet_device(bvh, tri9)

    if probe is not None:
        pr = probe.radiance
        pc = probe.cdf_cond
        pm = probe.cdf_marg
        pp = probe.pdf
        has_probe = True
    else:
        pr = np.zeros((1, 1, 3), np.float32)
        pc = np.ones((1, 1), np.float32)
        pm = np.ones(1, np.float32)
        pp = np.full((1, 1), 1.0 / (4.0 * np.pi), np.float32)
        has_probe = False

    return SceneBuffers(
        tri_p0=jnp.asarray(padt(p0, 1e30)),
        tri_e1=jnp.asarray(padt(p1 - p0)),
        tri_e2=jnp.asarray(padt(p2 - p0)),
        tri_n0=jnp.asarray(padt(n0)),
        tri_n1=jnp.asarray(padt(n1)),
        tri_n2=jnp.asarray(padt(n2)),
        tri_uv0=jnp.asarray(padt(uv0)),
        tri_uv1=jnp.asarray(padt(uv1)),
        tri_uv2=jnp.asarray(padt(uv2)),
        tri_mat=jnp.asarray(pad_rows(tri_mat, Tp, 0)),
        tri_inst=jnp.asarray(pad_rows(tri_inst, Tp, -1)),
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        node_first=jnp.asarray(node_first),
        node_count=jnp.asarray(node_count),
        node_miss=jnp.asarray(node_miss),
        mat_color=jnp.asarray(mat_color),
        mat_roughness=jnp.asarray(mat_roughness),
        mat_metallic=jnp.asarray(mat_metallic),
        mat_albedo_tex=jnp.asarray(mat_albedo_tex),
        mat_mra_tex=jnp.asarray(mat_mra_tex),
        mat_emission=jnp.asarray(mat_emission),
        light_origin=jnp.asarray(light_origin),
        light_eu=jnp.asarray(light_eu),
        light_ev=jnp.asarray(light_ev),
        light_emission=jnp.asarray(light_emission),
        atlas=jnp.asarray(atlas.texture),
        atlas_blocks=jnp.asarray(atlas.blocks),
        probe=jnp.asarray(pr),
        probe_cdf_cond=jnp.asarray(pc),
        probe_cdf_marg=jnp.asarray(pm),
        probe_pdf=jnp.asarray(pp),
        node_pack=jnp.asarray(node_pack),
        tri_pack=jnp.asarray(tri_pack),
        node_rows=jnp.asarray(node_rows),
        leaf_rows=jnp.asarray(leaf_rows),
        trav_rows=jnp.asarray(trav),
        wide_end=int(wide.end_index),
        wide_stack=int(wide_stack),
        wide_width=int(wide.width),
        wide_leaf_rows=int(wide.leaf_rows),
        treelet=treelet_dev,
        num_leaves=L,
        leaf_cap=int(max(bvh.count.max() if bvh.count.size else 1,
                         wide.leaf_row_max)),
        tri_shade=jnp.asarray(tri_shade),
        mat_pack=jnp.asarray(mat_pack),
        num_tris=T,
        num_nodes=N,
        stack_depth=stack_depth,
        num_lights=len(scene.lights),
        has_probe=has_probe,
        has_textures=len(scene.images) > 0,
        end_index=N,
    )
