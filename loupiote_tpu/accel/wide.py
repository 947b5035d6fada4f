"""BVH2 -> wide (8-ary) collapse for the TPU traversal kernel.

Why wide nodes on TPU: the sub-packet traversal kernel
(ops/pallas_wide.py) is *latency-bound* on its per-step dependency chain
(scalar extract -> dynamic row fetch -> control), not VPU-throughput-bound
(measured: leaf_cap 14 -> 1 changes diffuse-wave time by <8%%,
experiments/step_cost.py). One fetched 128-lane row can therefore carry 8
child AABBs instead of 1 at the same per-step cost, cutting the step count
~3x. This mirrors the reference's CWBVH choice (tinybvh-rs, 8-wide
compressed BVH, `Cargo.lock:3391-3399`, `app.rs:217`) arrived at from TPU
constraints rather than CUDA warp ones.

Unified row table layout (``trav_rows``: (W + L, 128) float32):
  - rows [0, W): wide internal nodes. Child c in lanes [16c, 16c+16):
      [min.x, min.y, min.z, max.x, max.y, max.z, ptr, pad...]
    ``ptr`` (bitcast int32) is the child's row index (wide or leaf row);
    -1 marks an empty slot. Lane 127 (child 7 pad) = kind tag 0.
  - rows [W, W+L): leaf rows: 14 triangles x [p0, e1, e2] in lanes
    [0, 126), lane 126 = (global_first << 4 | count) bitcast int32,
    lane 127 = kind tag 1.
The root is always row 0 (a leaf-only scene has W == 0 and the root leaf
at row 0).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bvh import FlatBVH

WIDTH = 8
LEAF_ROW_CAP = 14  # triangles per leaf row (9 floats each, 126 lanes)
LEAF_TAG = 1 << 30  # child-pointer tag: target row is a leaf
LEAF_MASK = LEAF_TAG - 1


@dataclass
class WideBVH:
    trav_rows: np.ndarray  # (rows, 128) float32 unified row table
    num_wide: int
    num_leaf_rows: int
    stack_need: int  # max stack entries any traversal order can require
    end_index: int  # first row PAST the table (termination sentinel)
    leaf_row_max: int = LEAF_ROW_CAP  # max triangles in any ONE leaf row
    width: int = WIDTH  # children per internal node (8 = 1 row, 16 = 2)
    leaf_rows: int = 1  # consecutive 128-lane rows per leaf (14 tris each)


def _surface_area(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]


# DP collapse cost constants: expected row visits per random ray ~ sum of
# child-box areas; an internal step and a leaf flush cost about the same
# in the kernel (both are one fetched-row pass), so 1:1 by default. The
# leaf constant is slightly below 1 because deferred flushes amortize
# multiple parked rows per MT block.
C_NODE = 1.0
C_LEAF = 0.9


def _dp_clusters(bvh: FlatBVH, width: int = WIDTH,
                 leaf_row_cap: int = LEAF_ROW_CAP):
    """SAH-optimal collapse (Ylitie et al. 2017 style, simplified): a DP
    over the BVH2 chooses, per node, whether its subtree becomes a merged
    leaf row (<= ``leaf_row_cap`` triangles), a wide row, or is inlined
    into an ancestor row's child slots. Minimizes
        sum over rows of area(row root) * C_row
    = the expected fetched-row visits per random ray (the sub-packet
    kernel's step count proxy). vs the greedy largest-area collapse this
    measured ~17% fewer expected visits on arch-260k (child fill 4.4 ->
    ~7, and small sibling leaves merge into one row).

    Returns (wide_children, wide_of, leaf_nodes, leaf_row_of, tris,
    firstmin): leaf_nodes entries are subtree ROOTS (possibly internal
    BVH2 nodes whose whole subtree merged into one leaf row).
    """
    N = bvh.num_nodes
    count = bvh.count
    right = bvh.right
    is_leaf = count > 0
    INF = np.float64(1e30)

    tris = np.zeros(N, np.int64)
    firstmin = np.zeros(N, np.int64)
    area = np.empty(N, np.float64)
    d = np.maximum(bvh.node_max - bvh.node_min, 0.0)
    area[:] = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
    for n in range(N - 1, -1, -1):
        if is_leaf[n]:
            tris[n] = count[n]
            firstmin[n] = bvh.first[n]
        else:
            r = int(right[n])
            tris[n] = tris[n + 1] + tris[r]
            firstmin[n] = min(firstmin[n + 1], firstmin[r])

    # C[n, i]: min cost of giving subtree n exactly <= i child slots of an
    # ancestor row. split2[n, s]: argmin a of C(left, a) + C(right, s-a)
    # (the s-slot distribution of n's two children); kind1[n]: 0 = leaf
    # row, 1 = wide row, for the 1-slot choice.
    C = np.full((N, width + 1), INF)
    split2 = np.zeros((N, width + 1), np.int8)
    kind1 = np.zeros(N, np.int8)
    dist_stop = np.zeros((N, width + 1), bool)

    for n in range(N - 1, -1, -1):
        if is_leaf[n]:
            C[n, 1:] = area[n] * C_LEAF
            kind1[n] = 0
            dist_stop[n, :] = True
            continue
        l, r = n + 1, int(right[n])
        # Distributions of (l, r) into s slots.
        c2 = np.full(width + 1, INF)
        for s in range(2, width + 1):
            best, ba = INF, 1
            for a in range(1, s):
                v = C[l, a] + C[r, s - a]
                if v < best:
                    best, ba = v, a
            c2[s] = best
            split2[n, s] = ba
        row_cost = area[n] * C_NODE + c2[width]
        leaf_cost = (area[n] * C_LEAF if tris[n] <= leaf_row_cap else INF)
        if leaf_cost <= row_cost:
            C[n, 1] = leaf_cost
            kind1[n] = 0
        else:
            C[n, 1] = row_cost
            kind1[n] = 1
        dist_stop[n, 1] = True
        for s in range(2, width + 1):
            if C[n, 1] <= c2[s]:
                C[n, s] = C[n, 1]
                dist_stop[n, s] = True
            else:
                C[n, s] = c2[s]

    wide_children: list[list[int]] = []
    wide_of: dict[int, int] = {}
    leaf_nodes: list[int] = []
    leaf_row_of: dict[int, int] = {}

    def frontier(n: int, s: int, out: list[int]):
        st = [(n, s)]
        while st:
            m, i = st.pop()
            if dist_stop[m, i]:
                out.append(m)
            else:
                a = int(split2[m, i])
                # Left pushed last -> popped first: keep pre-order member
                # order (near-left first, same as the greedy emit).
                st.append((int(right[m]), i - a))
                st.append((m + 1, a))
        return out

    def add_member(m: int):
        if kind1[m] == 0:
            if m not in leaf_row_of:
                leaf_row_of[m] = len(leaf_nodes)
                leaf_nodes.append(m)
        else:
            emit_row(m)

    def emit_row(n: int):
        w = len(wide_children)
        wide_of[n] = w
        mem = frontier(n, width, [])
        wide_children.append(mem)
        for m in mem:
            add_member(m)

    if is_leaf[0] or tris[0] <= leaf_row_cap:
        # Tiny scene: one leaf row under a synthetic root wide node.
        wide_children.append([0])
        leaf_row_of[0] = 0
        leaf_nodes.append(0)
        kind1[0] = 0
    else:
        emit_row(0)
    return wide_children, wide_of, leaf_nodes, leaf_row_of, tris, firstmin


def _build_clusters(bvh: FlatBVH, width: int = WIDTH):
    """Greedy largest-surface-area collapse of the BVH2 into clusters of up
    to ``width`` frontier members. Returns (wide_children, wide_of,
    leaf_nodes, leaf_row_of) — shared by collapse_wide and the archived
    per-lane top-table builder (experiments/treelet/lane_top.py), which
    must agree exactly."""
    count = bvh.count
    right = bvh.right
    is_leaf = count > 0

    def cluster(n2: int) -> list[int]:
        members = [n2 + 1, int(right[n2])]
        while len(members) < width:
            best_i, best_a = -1, -1.0
            for i, m in enumerate(members):
                if not is_leaf[m]:
                    a = _surface_area(bvh.node_min[m], bvh.node_max[m])
                    if a > best_a:
                        best_i, best_a = i, a
            if best_i < 0:
                break
            m = members.pop(best_i)
            members.extend([m + 1, int(right[m])])
        return members

    wide_children: list[list[int]] = []
    wide_of: dict[int, int] = {}
    leaf_nodes: list[int] = []  # bvh2 leaf node per leaf row, in emit order
    leaf_row_of: dict[int, int] = {}

    if is_leaf[0]:
        # Synthetic root wide node with the single leaf as its only child,
        # so the kernel's root is always an internal row.
        wide_children.append([0])
        leaf_row_of[0] = 0
        leaf_nodes.append(0)
    else:
        stack = [0]
        while stack:
            n2 = stack.pop()
            w = len(wide_children)
            wide_of[n2] = w
            mem = cluster(n2)
            wide_children.append(mem)
            # Recurse into internal members (reverse for stable pre-order).
            for m in reversed(mem):
                if not is_leaf[m]:
                    stack.append(m)
                else:
                    if m not in leaf_row_of:
                        leaf_row_of[m] = len(leaf_nodes)
                        leaf_nodes.append(m)
    return wide_children, wide_of, leaf_nodes, leaf_row_of


def collapse_wide_maps(bvh: FlatBVH, width: int = WIDTH, dp: bool = True):
    """(wide_of, leaf_row_of, W) for code that needs the BVH2-node ->
    unified-row mapping without rebuilding the row table.

    With the DP collapse, ``leaf_row_of`` keys are subtree ROOTS — an
    internal BVH2 node whose whole (<= 14-triangle) subtree merged into
    one leaf row appears here and NOT in ``wide_of``.
    """
    if dp:
        wide_children, wide_of, leaf_nodes, leaf_row_of, _, _ = \
            _dp_clusters(bvh, width)
    else:
        wide_children, wide_of, leaf_nodes, leaf_row_of = _build_clusters(
            bvh, width)
    return wide_of, leaf_row_of, len(wide_children)


def _octant_slots(bvh: FlatBVH, mem: list[int], width: int):
    """Assign each cluster member to a direction-coded slot.

    For width 8, slot s is a 3-bit octant code: bit a = 1 iff the member's
    box center is on the positive side of the members' mean center along
    axis a; collisions resolve greedily (largest offset magnitude first,
    best-aligned free slot). For width 16, each octant code owns TWO slots
    (s & 7 = octant, s >> 3 = pair index); the better-aligned member takes
    the pair-0 slot so the kernel's intra-pair priority (pair 0 before
    pair 1) visits the more direction-extreme child first.
    Returns a list of length ``width``: member id or None per slot.
    """
    k = len(mem)
    centers = (bvh.node_min[mem] + bvh.node_max[mem]) * 0.5  # (k, 3)
    off = centers - centers.mean(axis=0, keepdims=True)
    # Octant direction vectors: d[o][a] = +1 if bit a of o is set else -1.
    o_ids = np.arange(8)
    d = np.stack([(o_ids >> a) & 1 for a in range(3)], axis=1) * 2.0 - 1.0
    align8 = off @ d.T  # (k, 8): alignment of member with each octant
    if width == 8:
        align = align8
    else:
        # Two slots per octant; a tiny penalty on the pair-1 copy makes the
        # greedy fill pair-0 first.
        eps = 1e-6 * (1.0 + np.abs(align8).max())
        align = np.concatenate([align8, align8 - eps], axis=1)  # (k, 16)
    order = np.argsort(-np.linalg.norm(off, axis=1), kind="stable")
    slot_of: list = [None] * width
    free = np.ones(width, bool)
    for i in order:
        s = int(np.argmax(np.where(free, align[i], -np.inf)))
        slot_of[s] = mem[i]
        free[s] = False
    assert k <= width
    return slot_of


def collapse_wide(bvh: FlatBVH, tri9: np.ndarray,
                  width: int = WIDTH, dp: bool = True,
                  leaf_rows: int = 1) -> WideBVH:
    """Collapse a threaded BVH2 into the unified wide row table.

    ``tri9``: (T, 9) float32 [p0, e1, e2] per triangle in BVH leaf order
    (the same data the BVH2 leaf rows hold). ``dp`` selects the SAH DP
    collapse (default; see _dp_clusters) over the round-2 greedy.

    ``width`` 8 or 16: a 16-ary internal node spans TWO consecutive rows
    (children 0-7 in the first, 8-15 in the second; same 16-lane child
    layout) and is addressed by its FIRST row — the kernel fetches
    ``rows[ptr]`` and ``rows[ptr + 1]``. The width-16 step count is ~16%
    lower on the arch-260k diffuse wave (experiments/width_sim.py) at the
    cost of one extra (latency-hidden) fetch per internal step.

    ``leaf_rows`` N >= 1: every leaf spans N consecutive rows (up to
    14*N triangles; the DP merges bigger subtrees), addressed by the
    FIRST row. A flush MT-tests all N rows — vector ops are nearly free
    under the latency-bound cost model (MT x2 measured +3%), while the
    merged leaves remove whole internal AND leaf steps
    (experiments/leafcap_sim.py).
    """
    count = bvh.count
    is_leaf = count > 0
    assert width in (8, 16) and 1 <= leaf_rows <= 4
    rpn = width // WIDTH  # rows per internal node
    lrn = leaf_rows
    cap = LEAF_ROW_CAP * lrn

    if dp:
        (wide_children, wide_of, leaf_nodes, leaf_row_of, tris,
         firstmin) = _dp_clusters(bvh, width, leaf_row_cap=cap)
    else:
        wide_children, wide_of, leaf_nodes, leaf_row_of = _build_clusters(
            bvh, width)
        tris = None
    W = len(wide_children)
    L = len(leaf_nodes)
    rows = np.zeros((W * rpn + L * lrn, 128), np.float32)

    def _i32(x):
        return np.float32(np.int32(x).view(np.float32))

    def leaf_fc(n2: int):
        """(first, count) of the leaf row rooted at n2 (merged subtrees
        cover one contiguous global triangle range — DFS ordering)."""
        if tris is not None:
            return int(firstmin[n2]), int(tris[n2])
        return int(bvh.first[n2]), int(count[n2])

    # Wide node rows. Children are placed at OCTANT SLOTS (CWBVH-style,
    # Ylitie et al. 2017): slot bit a is set iff the child's center lies
    # on the positive side of the siblings' mean along axis a. The kernel
    # then orders its descent by ``slot ^ ray_octant`` — a fixed priority
    # computed once per sub-packet — instead of a per-step pairwise-tnear
    # rank matrix (measured ~580 ns of the ~1.2 us step cost).
    for w, mem in enumerate(wide_children):
        slot_of = _octant_slots(bvh, mem, width)
        for c in range(width):
            r = w * rpn + (c // WIDTH)
            b = 16 * (c % WIDTH)
            m = slot_of[c]
            if m is not None:
                rows[r, b:b + 3] = bvh.node_min[m]
                rows[r, b + 3:b + 6] = bvh.node_max[m]
                # Leaf children carry the tag bit so the kernel can defer
                # leaf processing without fetching the row first.
                ptr = ((W * rpn + leaf_row_of[m] * lrn) | LEAF_TAG
                       if m in leaf_row_of else wide_of[m] * rpn)
                rows[r, b + 6] = _i32(ptr)
            else:
                rows[r, b:b + 3] = 1e30
                rows[r, b + 3:b + 6] = -1e30
                rows[r, b + 6] = _i32(-1)
        for rr in range(rpn):
            rows[w * rpn + rr, 127] = _i32(0)

    # Leaf rows: each leaf's triangles split across lrn consecutive rows,
    # every row self-describing via its own (first, count) word so the
    # flush MT block needs no cross-row bookkeeping.
    for li, n2 in enumerate(leaf_nodes):
        f, c = leaf_fc(n2)
        assert c <= cap
        for j in range(lrn):
            r = W * rpn + li * lrn + j
            fj = f + LEAF_ROW_CAP * j
            cj = min(max(c - LEAF_ROW_CAP * j, 0), LEAF_ROW_CAP)
            block = tri9[fj:fj + cj].reshape(-1)
            rows[r, :block.size] = block
            for k in range(cj, LEAF_ROW_CAP):
                rows[r, 9 * k:9 * k + 3] = 1e30  # degenerate: never hits
            rows[r, 126] = _i32((fj << 4) | cj)
            rows[r, 127] = _i32(1)

    # Worst-case stack need: pushing (k-1) children then descending.
    need = np.zeros(W + 1, np.int64)  # need[W] unused pad

    def _need(w: int) -> int:
        mem = wide_children[w]
        k = len(mem)
        child_need = 0
        for m in mem:
            if m in wide_of:
                child_need = max(child_need, _need_memo[wide_of[m]])
        return (k - 1) + max(child_need, 1)

    # Bottom-up: wide nodes are in pre-order, so children have larger ids.
    _need_memo = np.zeros(max(W, 1), np.int64)
    for w in range(W - 1, -1, -1):
        _need_memo[w] = _need(w)
    stack_need = int(_need_memo[0]) + 2 if W else 2
    del need

    leaf_row_max = max((min(leaf_fc(n2)[1], LEAF_ROW_CAP)
                        for n2 in leaf_nodes), default=1)
    return WideBVH(trav_rows=rows, num_wide=W, num_leaf_rows=L,
                   stack_need=stack_need, end_index=W * rpn + L * lrn,
                   leaf_row_max=leaf_row_max, width=width, leaf_rows=lrn)
