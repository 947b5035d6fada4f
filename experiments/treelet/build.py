"""Treelet partition for the two-phase per-lane traversal pipeline.

Phase 1 (ops/lane_top.py kernel): every lane walks the threaded TOP region
of the BVH2 and enqueues the SUBTREE ids whose root boxes it enters.
Phase 2 (ops/lane_bottom.py): pairs (ray, subtree) are binned by subtree;
each 1024-pair block loads its subtree's single (8, 128) gather tile per
field and every lane walks its subtree independently — node slab tests AND
triangle tests per lane, killing the sub-packet union redundancy (~13x on
diffuse waves, ROADMAP) that bounds the wide kernel.

The partition cuts the BVH2 into bottom subtrees of at most ``ENTRY_CAP``
entries (1 entry per node + 1 per triangle), each fitting exactly one
(8, 128) tile per field, so the phase-2 kernel's per-lane gather runs at
the 1-tile rate measured in experiments/lane_gather_bench.py.

Subtree entry layout (fields, f32 tables with ints bitcast):
  f0..f5  node: box min/max     tri: p0.xyz, e1.xyz
  f6..f8  node: unused          tri: e2.xyz
  f9      link: hit_id | miss_id << 10 | is_tri << 20 | local_tri << 21
          (10-bit entry ids, END = 1023; tri entries store next_id in BOTH
          link slots; local_tri is the subtree-local triangle ordinal —
          global id = sub_tri_base[s] + local_tri, valid because a DFS
          subtree's triangles are one contiguous global range)
  f10     tri: global triangle id (int32); node: -1 (host-side reference
          only — the phase-2 kernel reads f0..f9)

Threading is plain DFS order (no per-lane ordered descent — pruning comes
from the t-bound and in-walk best-t shrinking).

Reference behavior parity: this implements the IntersectorPass contract
(`/root/reference/crates/lib/src/renderer.rs:453-464`) on the same built
tree as accel/bvh.py; results must agree exactly with the SIMT oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from loupiote_tpu.accel.bvh import FlatBVH

ENTRY_CAP = 1023  # entries per subtree (id 1023 = END sentinel)
SUB_END = 1023
TOP_ID_BITS = 12  # phase-1 table ids (lane_top.ID_BITS)
F_LINK = 9
F_AUX = 10
NUM_FIELDS = 11


@dataclass
class TreeletTables:
    # Phase-1 top table, in ops/lane_top.py layout: (8, T, 8, 128) f32.
    # ``pend`` entries hold SUBTREE ids.
    top_fields: np.ndarray
    num_top: int
    top_tiles: int
    # Phase-2 subtree tables: (NUM_FIELDS, S, 8, 128) f32.
    sub_fields: np.ndarray
    num_subtrees: int
    # Max entries used by any subtree (diagnostics) and per-subtree entry
    # counts (host-side stats).
    sub_entries: np.ndarray  # (S,) int32
    # Global triangle id of each subtree's local ordinal 0.
    sub_tri_base: np.ndarray = None  # (S,) int32


def _subtree_sizes(bvh: FlatBVH):
    """entries(n) = nodes + triangles in the subtree rooted at n."""
    N = bvh.num_nodes
    is_leaf = bvh.count > 0
    sizes = np.zeros(N, np.int64)
    for n in range(N - 1, -1, -1):
        if is_leaf[n]:
            sizes[n] = 1 + int(bvh.count[n])
        else:
            sizes[n] = 1 + sizes[n + 1] + sizes[int(bvh.right[n])]
    return sizes


def build_treelet_tables(bvh: FlatBVH, cap: int = ENTRY_CAP,
                         min_top: int = 1) -> TreeletTables:
    from .lane_top import ID_MASK, SUB, SUBP, TILE

    N = bvh.num_nodes
    is_leaf = bvh.count > 0
    sizes = _subtree_sizes(bvh)

    # --- cut: highest nodes whose whole subtree fits one tile. -----------
    cut_roots: list[int] = []
    in_top = np.zeros(N, bool)
    stack = [0]
    while stack:
        n = stack.pop()
        if sizes[n] <= cap and len(cut_roots) >= 0 and n != 0:
            cut_roots.append(n)
            continue
        if sizes[n] <= cap and n == 0:
            # Tiny scene: root itself is one subtree; top is a single
            # frontier entry pointing at it.
            cut_roots.append(n)
            continue
        in_top[n] = True
        stack.append(int(bvh.right[n]))
        stack.append(n + 1)

    subtree_of = {r: i for i, r in enumerate(cut_roots)}
    S = len(cut_roots)

    # --- phase-1 top table (lane_top layout; frontier = cut roots). ------
    top_ids = [int(i) for i in np.nonzero(in_top)[0]]
    order = top_ids + cut_roots
    K = len(order)
    assert K < ID_MASK, f"top region too large: {K}"
    remap = {n: i for i, n in enumerate(order)}

    def rid(t: int) -> int:
        return remap.get(t, ID_MASK) if t < N else ID_MASK

    minx = np.empty(K, np.float32)
    miny = np.empty(K, np.float32)
    minz = np.empty(K, np.float32)
    maxx = np.empty(K, np.float32)
    maxy = np.empty(K, np.float32)
    maxz = np.empty(K, np.float32)
    link = np.zeros(K, np.int32)
    pend = np.full(K, -1, np.int32)
    for i, n2 in enumerate(order):
        minx[i], miny[i], minz[i] = bvh.node_min[n2]
        maxx[i], maxy[i], maxz[i] = bvh.node_max[n2]
        miss_id = rid(int(bvh.miss[n2]))
        if in_top[n2]:
            hit_id = rid(n2 + 1)
            assert hit_id != ID_MASK
        else:  # frontier: enqueue the subtree, continue at the miss link
            hit_id = ID_MASK
            pend[i] = subtree_of[n2]
        link[i] = np.int32(hit_id | (miss_id << TOP_ID_BITS))

    T = max(1, -(-K // TILE))
    top = np.zeros((8, T * TILE), np.float32)
    for fi, arr in enumerate((minx, miny, minz, maxx, maxy, maxz)):
        top[fi, :K] = arr
        top[fi, K:] = 1e30 if fi < 3 else -1e30
    top[6, :K] = link.view(np.float32)
    top[6, K:] = np.int32(ID_MASK | (ID_MASK << TOP_ID_BITS)).view(np.float32)
    top[7, :K] = pend.view(np.float32)
    top[7, K:] = np.float32(np.int32(-1).view(np.float32))

    # --- phase-2 subtree tables. ----------------------------------------
    fields = np.zeros((NUM_FIELDS, S, SUB * SUBP), np.float32)
    # Defaults: empty boxes never hit, links -> END, aux -1.
    fields[0:3, :, :] = 1e30
    fields[3:6, :, :] = -1e30
    fields[F_LINK, :, :] = np.float32(np.int32(
        SUB_END | (SUB_END << 10)).view(np.float32))
    fields[F_AUX, :, :] = np.float32(np.int32(-1).view(np.float32))
    entries_used = np.zeros(S, np.int32)
    tri_bases = np.zeros(S, np.int32)

    for si, root in enumerate(cut_roots):
        # DFS emit: (node, skip_target_entry) with skip patched after
        # the subtree is laid out. First pass: assign entry ids in DFS
        # order; second pass: fill fields with hit/miss ids.
        ids: dict[int, int] = {}
        tri_base: dict[int, int] = {}
        cnt = 0
        st = [root]
        dfs: list[int] = []
        while st:
            n = st.pop()
            dfs.append(n)
            ids[n] = cnt
            cnt += 1
            if is_leaf[n]:
                tri_base[n] = cnt
                cnt += int(bvh.count[n])
            else:
                st.append(int(bvh.right[n]))
                st.append(n + 1)
        # cnt <= cap < SUB_END: entry ids must never collide with END.
        assert cnt <= cap, f"subtree {si} has {cnt} entries"
        entries_used[si] = cnt

        # skip target of n within the subtree = entry of bvh.miss[n] if the
        # miss target stays inside this subtree, else END. Inside test: the
        # miss link of the subtree's nodes either stays in the subtree or
        # exits it permanently (threaded DFS property).
        def eid(t: int) -> int:
            return ids.get(t, SUB_END) if t < N else SUB_END

        # A DFS subtree's triangles form one contiguous global range (the
        # BVH reorders triangles leaf-DFS-contiguously), so the subtree-
        # local ordinal recovers the global id from one per-subtree base.
        base = min((int(bvh.first[n]) for n in dfs if is_leaf[n]),
                   default=0)
        tri_bases[si] = base
        local_ord = 0

        f = fields[:, si, :]
        for n in dfs:
            e = ids[n]
            miss_e = eid(int(bvh.miss[n]))
            if is_leaf[n]:
                hit_e = tri_base[n]  # descend into the triangle run
            else:
                hit_e = ids[n + 1]
            f[0:3, e] = bvh.node_min[n]
            f[3:6, e] = bvh.node_max[n]
            f[F_LINK, e] = np.int32(hit_e | (miss_e << 10)).view(np.float32)
            f[F_AUX, e] = np.int32(-1).view(np.float32)
            if is_leaf[n]:
                first, count = int(bvh.first[n]), int(bvh.count[n])
                assert first - base == local_ord, "non-contiguous subtree"
                for k in range(count):
                    te = tri_base[n] + k
                    nxt = te + 1 if k + 1 < count else miss_e
                    f[F_LINK, te] = np.int32(
                        nxt | (nxt << 10) | (1 << 20)
                        | (local_ord << 21)).view(np.float32)
                    f[F_AUX, te] = np.int32(first + k).view(np.float32)
                    local_ord += 1
                    # Geometry is filled by fill_triangles (needs tri data).

    tables = TreeletTables(
        top_fields=top.reshape(8, T, SUB, SUBP),
        num_top=K,
        top_tiles=T,
        sub_fields=fields.reshape(NUM_FIELDS, S, SUB, SUBP),
        num_subtrees=S,
        sub_entries=entries_used,
        sub_tri_base=tri_bases,
    )
    return tables


def fill_triangles(tables: TreeletTables, tri9: np.ndarray) -> None:
    """Fill tri entry geometry (p0, e1, e2) from the BVH-ordered (T, 9)
    triangle array, in place."""
    S = tables.num_subtrees
    f = tables.sub_fields.reshape(NUM_FIELDS, S, -1)
    link = f[F_LINK].view(np.int32)
    aux = f[F_AUX].view(np.int32)
    is_tri = (link >> 20) & 1
    si, ei = np.nonzero(is_tri)
    gt = aux[si, ei]
    for c in range(9):
        f[c, si, ei] = tri9[gt, c]


def build_treelets(bvh: FlatBVH, tri9: np.ndarray,
                   cap: int = ENTRY_CAP) -> TreeletTables:
    t = build_treelet_tables(bvh, cap=cap)
    fill_triangles(t, tri9)
    return t


# --- CPU reference walker (tests) ----------------------------------------

def walk_subtree_ref(tables: TreeletTables, si: int, ro, rd, t0=1e30,
                     t_min: float = 1e-4, return_steps: bool = False):
    """Single-ray reference walk of one subtree. Returns (t, tri) or
    (t, tri, steps)."""
    f = tables.sub_fields.reshape(NUM_FIELDS, tables.num_subtrees, -1)
    link = f[F_LINK, si].view(np.int32)
    aux = f[F_AUX, si].view(np.int32)
    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                         np.where(rd >= 0, 1e-20, -1e-20))
    best_t, best_tri = t0, -1
    e = 0
    steps = 0
    while e != SUB_END and steps < 4096:
        steps += 1
        lk = int(link[e])
        hit_id, miss_id, is_tri = lk & 1023, (lk >> 10) & 1023, (lk >> 20) & 1
        if is_tri:
            p0 = f[0:3, si, e]
            e1 = f[3:6, si, e]
            e2 = f[6:9, si, e]
            pv = np.cross(rd, e2)
            det = float(e1 @ pv)
            if abs(det) > 1e-12:
                iv = 1.0 / det
                tv = ro - p0
                u = float(tv @ pv) * iv
                qv = np.cross(tv, e1)
                v = float(rd @ qv) * iv
                t = float(e2 @ qv) * iv
                if (u >= 0 and v >= 0 and u + v <= 1
                        and t_min < t < best_t):
                    best_t, best_tri = t, int(aux[e])
            e = miss_id
        else:
            bmin = f[0:3, si, e]
            bmax = f[3:6, si, e]
            t1 = (bmin - ro) * inv
            t2 = (bmax - ro) * inv
            tn = float(np.max(np.minimum(t1, t2)))
            tf = float(np.min(np.maximum(t1, t2)))
            e = hit_id if (tf >= max(tn, 0.0) and tn < best_t) else miss_id
    if return_steps:
        return best_t, best_tri, steps
    return best_t, best_tri
