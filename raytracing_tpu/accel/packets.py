"""Host-side acceleration-structure build: the flat cluster hierarchy.

TPU-native rethink of the reference's build (/root/reference/src/opt.rs):
the reference stable-sorts triangles by vertex index for spatial locality
(`optimize_model`, opt.rs:11-36), then packs groups of 8 into SIMD packets
and groups of 64 under 8-wide AABB cluster nodes (`pack_model`,
opt.rs:38-80). Here the same idea maps to TPU tiling: triangles are sorted
by Morton code of their centroid (a strictly better locality sort; the
reference's index sort is also available for parity), packed into
lane-aligned clusters of `cluster_size` (default 128 = one VPU lane row),
padded with degenerate triangles, and each cluster gets an AABB. Traversal
tests a ray against all cluster AABBs (vectorized), then only intersects
triangles of hit clusters — tile-granular skipping in the Pallas kernel,
mask-granular in the XLA fallback.

The accel stores only integer orderings and (detached) float bounds: the
packed Möller–Trumbore triangle form is re-gathered from the live vertex
pool at trace time (`packed_triangles`), so the structure never blocks
gradient flow to vertices.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.geometry.mesh import Mesh
from raytracing_tpu.ops.intersect import INF, TriangleSoA, moller_trumbore, slab_test
from raytracing_tpu.ops.trace import Hit


class ClusterAccel(NamedTuple):
    """Flat single-level cluster structure over the scene's triangles.

    order:       [S] i32 — packed slot -> original triangle id (padding
                 slots repeat id 0 and are killed by slot_valid).
    slot_valid:  [S] bool — False for padding slots.
    cluster_min: [C, 3] f32 — per-cluster AABB (C = S / cluster_size).
    cluster_max: [C, 3] f32

    Kernel-ready blocks, precomputed host-side at build (detached from the
    autodiff graph by construction — traversal decisions are discrete; the
    differentiable path re-gathers from the live vertex pool, see
    `packed_triangles` and kernels/traverse.py). After mutating vertices,
    rebuild with `build_cluster_accel` (host, ~ms) — the standard
    BVH-refit contract.

    attr_blocks:  [C, A, CS] f32 — per-triangle shading attributes in
                  kernel layout. The walk kernel accumulates the winning
                  triangle's rows alongside t, which replaces the
                  post-trace attribute gather — a serial ~7 cycles/element
                  on TPU, measured 19.5 ms for one 2.56 M-ray id gather vs
                  5.7 ms for the whole traversal — with one vector select
                  per plane per visit (~0.55 ms/plane/frame). Two modes:
                    A=4 ("objid", when every object's triangles share one
                        color — the common case, incl. the reference
                        scene): normal(3) | obj_id, with color+material
                        reconstructed EXACTLY from attr_tables by a
                        trace-time select chain;
                    A=9 ("full", true per-triangle colors): normal(3) |
                        color(3) | albedo/pi, reflectivity, roughness.
                  Detached by construction; the differentiable path
                  re-gathers in backward only (traverse._lazy_attrs).
    attr_tables:  [O, 6] f32 (objid mode) — per-object color(3) +
                  material(3) rows; None in full mode.
    grad_blocks:  [C, 11, CS] f32 — BACKWARD-ONLY attribute planes:
                  v0(3) | e1(3) | e2(3) | tri_id | obj_id. The lazy VJP
                  re-runs the walk with these planes instead of paying
                  ~12 R-sized serial gathers to re-derive the winning
                  triangle's vertices and ids (the gathers measured ~70%
                  of the whole backward pass at wavefront sizes). The
                  forward/shading path never loads them.
    rest_grad:    [Rr, 11] f32 — same rows for the rest set.
    tri_blocks:   [C, 9, CS]  f32 — v0/e1/e2 rows, triangles on lanes
    pmt_t_blocks: [C, CS, 12] f32 — the Baldwin–Weber rows TRANSPOSED:
                  triangles on SUBLANES, the 12 quantities on lanes. This
                  is the walk kernel's default operand: slicing quantity q
                  is a lane slice producing a native [CS, 1] sublane
                  column, where the row-major layout needed a
                  [1, CS] -> [CS, 1] transpose PER QUANTITY PER VISIT
                  (12 transposes/visit — measured as most of the
                  per-visit fixed cost; removing them is ~1.9x on the
                  walk). VMEM pads the 12 lanes to 128 (10.7x logical
                  size) — the _vmem_group_clusters budget accounts for it.
    attr_t_blocks:[C, CS, A] f32 — attr_blocks transposed the same way.
    pmt_blocks:   [C, 12, CS] f32 — Baldwin–Weber precomputed form:
                  rows n(3), d0 = n·v0, U(3), u0 = -U·v0, V(3), v0c = -V·v0
                  with U = (e2 x n)/|n|^2, V = (n x e1)/|n|^2. Trades 3
                  extra stored rows for ~30% fewer VPU ops per
                  (ray, triangle) in the walk kernel: t from one plane
                  dot, u/v from two point dots — no per-ray cross products.
    woop_blocks:  [C, 8, 6*CS] f32 — affine unit-triangle transforms in
                  matmul layout (see kernels/traverse.pack layout docs)
    order_blocks: [C, CS] i32 — lane -> original triangle id (0 on padding)
    """

    order: jnp.ndarray
    slot_valid: jnp.ndarray
    cluster_min: jnp.ndarray
    cluster_max: jnp.ndarray
    tri_blocks: Optional[jnp.ndarray]
    pmt_blocks: jnp.ndarray
    pmt_t_blocks: Optional[jnp.ndarray]
    woop_blocks: Optional[jnp.ndarray]
    order_blocks: jnp.ndarray
    attr_blocks: jnp.ndarray
    attr_t_blocks: jnp.ndarray
    attr_tables: Optional[jnp.ndarray]
    # Rest set — the TPU analog of the reference's scalar tail loops
    # (opt.rs:69-72 rest_tri; consumed at main.rs:157-169): objects with
    # fewer triangles than a cluster would mostly pad (the 2-triangle
    # ground plane costs every ray 8 kernel tests for 2 real triangles —
    # ~24% of all tests on the teapot frame) AND their huge AABBs defeat
    # culling. They are instead intersected by a dense vectorized XLA
    # pass over all rays (Rr <= rest_max triangles), merged elementwise
    # with the kernel result. None when empty.
    rest_blocks: Optional[jnp.ndarray]   # [Rr, 9] v0|e1|e2 rows
    rest_ids: Optional[jnp.ndarray]      # [Rr] original triangle ids
    rest_attrs: Optional[jnp.ndarray]    # [Rr, A] attr-plane schema rows
    grad_blocks: jnp.ndarray             # [C, 11, CS] backward planes
    rest_grad: Optional[jnp.ndarray]     # [Rr, 11]

    @property
    def num_clusters(self) -> int:
        return self.cluster_min.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.order.shape[0] // self.cluster_min.shape[0]

    @property
    def order_ext(self) -> jnp.ndarray:
        """slot -> original triangle id INCLUDING rest slots (rest slot j
        is S + j, S = packed slot count)."""
        if self.rest_ids is None:
            return self.order
        return jnp.concatenate([self.order, self.rest_ids])


def _morton_codes(centroids: np.ndarray) -> np.ndarray:
    """30-bit Morton (Z-order) codes of points normalized to the scene AABB."""
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    q = ((centroids - lo) / np.maximum(hi - lo, 1e-20) * 1023.0).astype(np.uint32)
    q = np.minimum(q, 1023)

    def expand(v):  # spread 10 bits to every 3rd bit
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])


def _median_split_order(cent: np.ndarray, cs: int) -> np.ndarray:
    """Longest-axis median split into contiguous `cs`-sized runs — the
    leaf layer of an object-median BVH, flattened. Versus a Morton sort
    (whose Z-order jumps leave fat cluster AABBs), the split keeps every
    cluster a compact spatial blob: measured on the teapot frame it cuts
    tile-visit triangle tests from 64 to 28 per ray at cs=8 (and at 404k
    triangles Morton's looser boxes cost ~2x in traversal). Split counts
    are kept multiples of cs so clusters never straddle a split plane.

    Implementation is level-synchronous and fully vectorized (one
    lexsort + reduceat per depth level over ALL segments at once) — the
    per-segment recursive version took ~160 s at 1.6M triangles; this
    runs the same split in a few seconds."""
    n = cent.shape[0]
    order = np.arange(n)
    bounds = np.array([0, n], dtype=np.int64)
    while True:
        lens = np.diff(bounds)
        if (lens <= cs).all():
            return order
        starts = bounds[:-1]
        c = cent[order]
        mins = np.minimum.reduceat(c, starts, axis=0)
        maxs = np.maximum.reduceat(c, starts, axis=0)
        axis = np.argmax(maxs - mins, axis=1)  # [S] per-segment split axis
        seg_id = np.searchsorted(bounds, np.arange(n), side="right") - 1
        keyc = c[np.arange(n), axis[seg_id]]
        idx = np.lexsort((keyc, seg_id))  # stable within segment
        order = order[idx]
        half = np.where(lens > cs,
                        np.maximum((lens // 2 // cs) * cs, cs), 0)
        new_b = (starts + half)[half > 0]
        bounds = np.unique(np.concatenate([bounds, new_b]))


def _sah_split_order(cent: np.ndarray, blo: np.ndarray, bhi: np.ndarray,
                     cs: int) -> np.ndarray:
    """Recursive SAH sweep split into contiguous `cs`-sized runs: at each
    node, try all three axes and every cs-aligned split position, pick the
    one minimizing surface-area x triangle-count (the standard binned-BVH
    objective, swept exactly). On the teapot frame this cuts tile-visit
    triangle tests another ~11% below the median split (43 -> 38 per ray
    at cs=16). O(n log^2 n) host-side numpy, ~100 ms for 12.6k triangles."""
    out = []

    def sa(lo, hi):
        e = np.maximum(hi - lo, 0.0)
        return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] \
            + e[..., 2] * e[..., 0]

    def rec(ids: np.ndarray) -> None:
        k = len(ids)
        if k <= cs:
            out.append(ids)
            return
        best = None
        for ax in range(3):
            srt = ids[np.argsort(cent[ids, ax], kind="stable")]
            lo_pre = np.minimum.accumulate(blo[srt], axis=0)
            hi_pre = np.maximum.accumulate(bhi[srt], axis=0)
            lo_suf = np.minimum.accumulate(blo[srt][::-1], axis=0)[::-1]
            hi_suf = np.maximum.accumulate(bhi[srt][::-1], axis=0)[::-1]
            cands = np.arange(cs, k, cs)
            costs = (sa(lo_pre[cands - 1], hi_pre[cands - 1]) * cands
                     + sa(lo_suf[cands], hi_suf[cands]) * (k - cands))
            j = int(np.argmin(costs))
            if best is None or costs[j] < best[0]:
                best = (costs[j], srt, int(cands[j]))
        _, srt, half = best
        rec(srt[:half])
        rec(srt[half:])

    rec(np.arange(cent.shape[0]))
    return np.concatenate(out)


def _sah_sweep_order(cent: np.ndarray, blo: np.ndarray, bhi: np.ndarray,
                     cs: int) -> np.ndarray:
    """Level-synchronous exact-sweep SAH split — the same objective,
    candidate set (every cs-aligned position, all 3 axes, exact swept
    boxes) and therefore the same cluster quality as `_sah_split_order`,
    but organized so the whole tree level is built at once:

      * the 3 axis-sorted triangle lists are computed ONCE up front and
        maintained through splits by a stable cumsum partition (O(n) per
        level instead of an argsort per node per axis — the recursive
        version's dominant cost, ~2 min at 400k triangles);
      * prefix/suffix swept boxes are evaluated at BLOCK granularity
        (cs triangles per block; candidates only exist at block
        boundaries, so this is exact) over a [segments, max_blocks]
        rectangle, chunked to bound the padding memory.

    Runs in a few seconds at 1.6M triangles, which retires the
    100k-triangle auto fallback to the median split."""
    n = cent.shape[0]
    if n <= cs:
        return np.arange(n)
    nb = (n + cs - 1) // cs

    def sa(lo, hi):
        e = np.maximum(hi - lo, 0.0)
        return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] \
            + e[..., 2] * e[..., 0]

    # Per-axis triangle lists, sorted once; stable so ties match the
    # recursive builder's argsort(kind="stable").
    ids3 = [np.argsort(cent[:, a], kind="stable") for a in range(3)]
    bounds = np.array([0, n], dtype=np.int64)
    pos = np.arange(n, dtype=np.int64)
    big = np.float32(1e30)
    blo = blo.astype(np.float32)
    bhi = bhi.astype(np.float32)
    pad = nb * cs - n

    while True:
        lens = np.diff(bounds)
        live = lens > cs  # segments that still need a split
        if not live.any():
            break
        starts = bounds[:-1]

        # Per-axis block-reduced boxes of the CURRENT orderings (cs
        # triangles per block; segment starts are cs-aligned so blocks
        # never straddle segments). Recomputed once per level.
        blo_b3, bhi_b3 = [], []
        for a in range(3):
            lo_t = blo[ids3[a]]
            hi_t = bhi[ids3[a]]
            if pad:
                lo_t = np.concatenate(
                    [lo_t, np.full((pad, 3), big, np.float32)])
                hi_t = np.concatenate(
                    [hi_t, np.full((pad, 3), -big, np.float32)])
            blo_b3.append(lo_t.reshape(nb, cs, 3).min(axis=1))
            bhi_b3.append(hi_t.reshape(nb, cs, 3).max(axis=1))
        s_starts = starts[live]
        s_lens = lens[live]
        s_blocks = (s_lens + cs - 1) // cs
        s_bstart = s_starts // cs  # starts are cs-aligned by construction

        # Best (cost, axis, split) per live segment, evaluated in
        # length-sorted chunks so the [G, Lmax] rectangles stay bounded.
        best_cost = np.full(len(s_lens), np.inf)
        best_axis = np.zeros(len(s_lens), dtype=np.int64)
        best_kb = np.ones(len(s_lens), dtype=np.int64)
        order_by_len = np.argsort(-s_blocks, kind="stable")
        area_budget = 1 << 24
        g0 = 0
        while g0 < len(order_by_len):
            lmax = int(s_blocks[order_by_len[g0]])
            g1 = min(len(order_by_len),
                     g0 + max(1, area_budget // max(lmax, 1)))
            sel = order_by_len[g0:g1]
            g0 = g1
            G = len(sel)
            L = int(s_blocks[sel].max())
            # Block gather indices (clipped; padding handled by sentinels).
            bidx = s_bstart[sel][:, None] + np.arange(L)[None, :]  # [G, L]
            inseg = np.arange(L)[None, :] < s_blocks[sel][:, None]
            bidx = np.minimum(bidx, nb - 1)
            cost = np.full((G, L), np.inf)
            axis_best = np.zeros((G, L), dtype=np.int64)
            kcand = np.arange(1, L + 1, dtype=np.int64)[None, :] * cs
            n_left = np.minimum(kcand, s_lens[sel][:, None])
            n_right = s_lens[sel][:, None] - n_left
            for a in range(3):
                glo = np.where(inseg[..., None], blo_b3[a][bidx], big)
                ghi = np.where(inseg[..., None], bhi_b3[a][bidx], -big)
                lo_pre = np.minimum.accumulate(glo, axis=1)
                hi_pre = np.maximum.accumulate(ghi, axis=1)
                lo_suf = np.minimum.accumulate(glo[:, ::-1], axis=1)[:, ::-1]
                hi_suf = np.maximum.accumulate(ghi[:, ::-1], axis=1)[:, ::-1]
                # Candidate kb blocks on the left: prefix over blocks
                # [0, kb), suffix over [kb, Lb). Valid kb in [1, Lb-1].
                c_a = np.full((G, L), np.inf)
                c_a[:, :-1] = (
                    sa(lo_pre[:, :-1], hi_pre[:, :-1]) * n_left[:, :-1]
                    + sa(lo_suf[:, 1:], hi_suf[:, 1:]) * n_right[:, :-1]
                )
                valid = (np.arange(1, L + 1)[None, :]
                         < s_blocks[sel][:, None])
                c_a = np.where(valid, c_a, np.inf)
                upd = c_a < cost
                cost = np.where(upd, c_a, cost)
                axis_best = np.where(upd, a, axis_best)
            j = np.argmin(cost, axis=1)
            rows = np.arange(G)
            best_cost[sel] = cost[rows, j]
            best_axis[sel] = axis_best[rows, j]
            best_kb[sel] = j + 1

        # Per-segment split (triangles). Non-live segments keep k = len
        # (everything "left", no new bound).
        k_seg = lens.copy()
        w_seg = np.zeros(len(lens), dtype=np.int64)
        k_seg[live] = best_kb * cs
        w_seg[live] = best_axis

        seg_of = np.searchsorted(bounds, pos, side="right") - 1
        off_in_seg = pos - starts[seg_of]
        left_mask = np.zeros(n, dtype=bool)
        for a in range(3):
            take = (w_seg[seg_of] == a) & (off_in_seg < k_seg[seg_of])
            left_mask[ids3[a][take]] = True

        # Stable partition of every axis list by left-membership, within
        # segments, via segmented cumsum ranks.
        c0_starts = starts[seg_of]
        for a in range(3):
            f = left_mask[ids3[a]]
            c = np.cumsum(f)
            cz = np.concatenate([[0], c])
            c_before_seg = cz[c0_starts]
            left_rank = c - c_before_seg - 1  # valid where f
            taken_left = k_seg[seg_of]  # == left count per segment
            right_rank = off_in_seg - (c - c_before_seg)  # rights before
            newpos = np.where(
                f,
                c0_starts + left_rank,
                c0_starts + taken_left + right_rank,
            )
            out = np.empty(n, dtype=np.int64)
            out[newpos] = ids3[a]
            ids3[a] = out

        new_b = (starts + k_seg)[live]
        bounds = np.unique(np.concatenate([bounds, new_b]))

    return ids3[0]


def first_tri_per_object(obj_id: np.ndarray, n_obj: int) -> np.ndarray:
    """[O] index of the first triangle of each object — the canonical
    representative row used by the objid-mode attribute tables (one color
    per object). Shared by the build, refit_attr_planes, and inverse.fit's
    precompute so the table layout convention lives in ONE place."""
    obj_id = np.asarray(obj_id)
    if obj_id.size == 0:
        return np.zeros(n_obj, dtype=np.int64)
    # An object with ZERO triangles has no representative row; clamp its
    # searchsorted position into range. The resulting (arbitrary) row is
    # never referenced at trace time — no triangle carries that obj_id —
    # it only keeps the attribute table rectangular.
    ft = np.minimum(np.searchsorted(np.sort(obj_id), np.arange(n_obj)),
                    obj_id.size - 1)
    return np.argsort(obj_id, kind="stable")[ft]


def _index_sort_order(tri_v: np.ndarray) -> np.ndarray:
    """The reference's locality sort (`optimize_model`, opt.rs:11-36):
    stable sort by min vertex index ascending, max vertex index descending."""
    mn = tri_v.min(axis=1).astype(np.int64)
    mx = tri_v.max(axis=1).astype(np.int64)
    return np.lexsort((-mx, mn)).astype(np.int32)


def build_cluster_accel(
    mesh: Mesh, cluster_size: int = 128, method: str = "auto",
    rest_max: int = 64, variants="auto",
) -> ClusterAccel:
    """Host-side (numpy) build. `method`: "auto" (= "sah" at every scale),
    "sah" (exact-sweep surface-area-heuristic split, level-synchronous —
    tightest clusters, ~20 s at 1.6M tris), "sah-recursive" (the per-node
    reference implementation, same objective, ~8 min at 1.6M — kept as
    the parity oracle), "median" (BVH-leaf median split), "morton"
    (Z-order sort), or "index" (reference-parity locality sort). Objects are packed independently so a cluster never spans two
    objects (mirroring the per-object build of opt.rs; keeps cluster AABBs
    tight when objects are far apart).

    Objects smaller than a cluster go to the dense REST SET (up to
    rest_max triangles total; see ClusterAccel.rest_blocks) instead of a
    mostly-padding cluster — but only when at least one object is big
    enough to cluster (a rest-only accel would leave the kernel walking
    nothing).

    variants: which kernel block families to materialize on device.
    "auto" = all of them up to 100k triangles, only the default ("pmt")
    beyond — the alternates cost real build time and device transfer
    (the woop matmul blocks alone are 307 MB at 1.6M triangles). Pass an
    explicit tuple (e.g. ("pmt", "woop")) to override; unbuilt families
    are None and selecting their variant at trace time raises."""
    verts = np.asarray(mesh.verts)
    tri_v = np.asarray(mesh.tri_v)
    obj_id = np.asarray(mesh.obj_id)
    if method == "auto":
        # The level-synchronous sweep (_sah_sweep_order) has retired the
        # old >100k fallback to the median split: exact-SAH quality is now
        # ~20 s at 1.6M triangles (the recursive sweep took ~8 min).
        method = "sah"
    if variants == "auto":
        variants = (("pmt", "mt", "pmtt", "woop")
                    if tri_v.shape[0] <= 100_000 else ("pmt",))

    n_obj = int(obj_id.max()) + 1 if obj_id.size else 0
    counts = [int((obj_id == oi).sum()) for oi in range(n_obj)]
    any_big = any(k >= cluster_size for k in counts)
    rest_parts: list = []
    rest_budget = rest_max

    order_parts = []
    for oi in range(n_obj):
        sel = np.nonzero(obj_id == oi)[0]
        if len(sel) == 0:
            # A zero-triangle object contributes nothing; appending it to
            # the rest set could make rest_parts non-empty with 0 total
            # rows, and a 0-row rest table crashes the rest-merge reduces.
            continue
        if (any_big and len(sel) < cluster_size
                and len(sel) <= rest_budget):
            rest_parts.append(sel)
            rest_budget -= len(sel)
            continue
        tv = tri_v[sel]
        if method == "index":
            sub = _index_sort_order(tv)
        elif method == "sah":
            tvv = verts[tv]
            cent_s = tvv.mean(axis=1)
            blo_s = tvv.min(axis=1)
            bhi_s = tvv.max(axis=1)
            from raytracing_tpu.geometry import native

            sub = (native.sah_sweep_order(cent_s, blo_s, bhi_s, cluster_size)
                   if native.available() else None)
            if sub is None:
                sub = _sah_sweep_order(cent_s, blo_s, bhi_s, cluster_size)
        elif method == "sah-recursive":
            tvv = verts[tv]
            sub = _sah_split_order(tvv.mean(axis=1), tvv.min(axis=1),
                                   tvv.max(axis=1), cluster_size)
        elif method == "median":
            cent = verts[tv].mean(axis=1)
            sub = _median_split_order(cent, cluster_size)
        else:
            cent = verts[tv].mean(axis=1)
            codes = _morton_codes(cent)
            from raytracing_tpu.geometry import native

            nat = native.morton_order(cent) if native.available() else None
            sub = nat if nat is not None else np.argsort(codes, kind="stable")
        part = sel[sub]
        # Pad each object's slot range to a full cluster so clusters don't
        # straddle objects.
        pad = (-len(part)) % cluster_size
        if pad:
            part = np.concatenate([part, np.full(pad, -1, dtype=part.dtype)])
        order_parts.append(part)

    order = np.concatenate(order_parts).astype(np.int64)
    valid = order >= 0
    order = np.where(valid, order, 0)

    # Cluster AABBs over the actual vertices of valid member triangles.
    c = len(order) // cluster_size
    tri_verts = verts[tri_v[order]]  # [S, 3 verts, 3]
    big = np.float32(1e30)
    vmin = np.where(valid[:, None, None], tri_verts, big).reshape(c, -1, 3).min(axis=1)
    vmax = np.where(valid[:, None, None], tri_verts, -big).reshape(c, -1, 3).max(axis=1)

    tri_blocks, pmt_blocks, woop_blocks = _kernel_blocks_host(
        tri_verts.astype(np.float32), valid, c, cluster_size,
        build_woop="woop" in variants,
    )
    # Shading attribute rows in packed order (see ClusterAccel docstring).
    # Padding slots are all-zero: their planes never win (t = +inf).
    normals = np.asarray(mesh.normals, dtype=np.float32)
    colors = np.asarray(mesh.colors, dtype=np.float32)
    materials = np.asarray(mesh.materials, dtype=np.float32)
    n_obj = materials.shape[0]
    # objid mode: one color per object and few enough objects that the
    # trace-time select chain stays cheaper than 5 more kernel planes.
    obj_colors = colors[first_tri_per_object(obj_id, n_obj)]
    uniform = n_obj <= 32 and bool(
        (colors == obj_colors[obj_id]).all()
    )
    if uniform:
        attrs = np.concatenate(
            [normals[order], obj_id[order][:, None].astype(np.float32)],
            axis=1,
        ) * valid[:, None]
        attr_tables = jnp.asarray(
            np.concatenate([obj_colors, materials], axis=1)
        )
    else:
        attrs = np.concatenate(
            [normals[order], colors[order], materials[obj_id[order]]],
            axis=1,
        ) * valid[:, None]
        attr_tables = None
    a_rows = attrs.shape[1]
    attr_t = attrs.reshape(c, cluster_size, a_rows)
    attr_blocks = attr_t.transpose(0, 2, 1)

    # Backward planes: v0/e1/e2 (= tri_blocks rows) + tri id + obj id.
    grad_rows = np.concatenate(
        [tri_blocks,
         order.astype(np.float32).reshape(c, 1, cluster_size),
         obj_id[order].astype(np.float32).reshape(c, 1, cluster_size)],
        axis=1,
    ).astype(np.float32)

    rest_blocks = rest_ids_j = rest_attrs = rest_grad = None
    if rest_parts:
        rest = np.concatenate(rest_parts).astype(np.int64)
        rv = verts[tri_v[rest]].astype(np.float32)  # [Rr, 3, 3]
        r_v0 = rv[:, 0]
        rest_blocks = jnp.asarray(np.concatenate(
            [r_v0, rv[:, 1] - r_v0, rv[:, 2] - r_v0], axis=1))
        rest_ids_j = jnp.asarray(rest.astype(np.int32))
        if uniform:
            ra = np.concatenate(
                [normals[rest], obj_id[rest][:, None].astype(np.float32)],
                axis=1)
        else:
            ra = np.concatenate(
                [normals[rest], colors[rest], materials[obj_id[rest]]],
                axis=1)
        rest_attrs = jnp.asarray(ra.astype(np.float32))
        rest_grad = jnp.asarray(np.concatenate(
            [np.asarray(rest_blocks),
             rest.astype(np.float32)[:, None],
             obj_id[rest].astype(np.float32)[:, None]],
            axis=1).astype(np.float32))
    return ClusterAccel(
        order=jnp.asarray(order.astype(np.int32)),
        slot_valid=jnp.asarray(valid),
        cluster_min=jnp.asarray(vmin.astype(np.float32)),
        cluster_max=jnp.asarray(vmax.astype(np.float32)),
        tri_blocks=(jnp.asarray(tri_blocks)
                    if "mt" in variants else None),
        pmt_blocks=jnp.asarray(pmt_blocks),
        pmt_t_blocks=(jnp.asarray(
            np.ascontiguousarray(pmt_blocks.transpose(0, 2, 1))
        ) if "pmtt" in variants else None),
        woop_blocks=(jnp.asarray(woop_blocks)
                     if "woop" in variants else None),
        order_blocks=jnp.asarray(
            order.astype(np.int32).reshape(c, cluster_size)
        ),
        attr_blocks=jnp.asarray(np.ascontiguousarray(attr_blocks)),
        attr_t_blocks=jnp.asarray(np.ascontiguousarray(attr_t)),
        attr_tables=attr_tables,
        rest_blocks=rest_blocks,
        rest_ids=rest_ids_j,
        rest_attrs=rest_attrs,
        grad_blocks=jnp.asarray(grad_rows),
        rest_grad=rest_grad,
    )


def _kernel_blocks_host(
    tri_verts: np.ndarray, valid: np.ndarray, c: int, cs: int,
    build_woop: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (numpy) build of the Pallas kernel data blocks.

    tri_blocks [C, 9, CS]: v0/e1/e2 component rows, triangles on lanes —
    the TPU layout of the reference's `pack_triangles` precompute
    (simd_accel.rs:59-63), with degenerate (e1 = e2 = 0) padding.

    woop_blocks [C, 8, 6*CS]: per-triangle affine unit-triangle transforms
    (Woop et al.) in matmul layout. For A = [e1 | e2 | n], n = e1 x e2,
    M = A^-1 maps world points to (u, v, w): a ray hits at t = -oL.z/dL.z,
    (u, v) = oL.xy + t dL.xy where oL = M(o - v0), dL = M d. The kernel
    computes oL/dL for a whole ray tile x cluster with ONE [RT, 8] @
    [8, 6*CS] MXU matmul on rows [ox oy oz 1 dx dy dz 0]; columns are
    grouped quantity-major (all oLx, then oLy, ...).
    """
    from raytracing_tpu.geometry import native

    if native.available():
        nat = native.kernel_blocks(tri_verts, valid, c, cs, build_woop)
        if nat is not None:
            return nat

    m = valid[:, None].astype(np.float32)
    v0 = tri_verts[:, 0]
    e1 = (tri_verts[:, 1] - v0) * m
    e2 = (tri_verts[:, 2] - v0) * m
    comp = np.concatenate([v0, e1, e2], axis=1)  # [S, 9]
    tri_blocks = comp.reshape(c, cs, 9).transpose(0, 2, 1)

    # Baldwin–Weber rows (see ClusterAccel docstring). Padding tris have
    # n = 0 -> plane denominator 0 -> always rejected by the eps test.
    nbw = np.cross(e1, e2)
    n2 = np.einsum("sk,sk->s", nbw, nbw)
    inv_n2 = np.where(n2 > 0, 1.0 / np.where(n2 > 0, n2, 1.0), 0.0)[:, None]
    U = np.cross(e2, nbw) * inv_n2
    V = np.cross(nbw, e1) * inv_n2
    pmt = np.concatenate(
        [
            nbw,
            np.einsum("sk,sk->s", nbw, v0)[:, None],
            U,
            -np.einsum("sk,sk->s", U, v0)[:, None],
            V,
            -np.einsum("sk,sk->s", V, v0)[:, None],
        ],
        axis=1,
    ).astype(np.float32)  # [S, 12]
    pmt_blocks = pmt.reshape(c, cs, 12).transpose(0, 2, 1)

    if not build_woop:
        return tri_blocks, pmt_blocks, None

    n = np.cross(e1, e2)
    c23 = np.cross(e2, n)
    c31 = np.cross(n, e1)
    det = np.einsum("sk,sk->s", e1, c23)  # = |n|^2
    ok = np.abs(det) > 1e-20
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)[:, None]
    m_rows = np.stack(
        [c23 * inv_det, c31 * inv_det, n * inv_det], axis=1
    )  # [S, 3(row), 3(xyz)]
    const = -np.einsum("sqk,sk->sq", m_rows, v0)  # [S, 3]
    s = v0.shape[0]
    w = np.zeros((s, 8, 6), dtype=np.float32)
    w[:, 0:3, 0:3] = m_rows.transpose(0, 2, 1)
    w[:, 3, 0:3] = const
    w[:, 4:7, 3:6] = m_rows.transpose(0, 2, 1)
    woop_blocks = (
        w.reshape(c, cs, 8, 6).transpose(0, 2, 3, 1).reshape(c, 8, 6 * cs)
    )
    return tri_blocks, pmt_blocks, np.ascontiguousarray(woop_blocks)


# The Pallas walk kernel keeps its kernel-block tables VMEM-resident (one
# DMA per grid step, zero per-visit latency). v5e VMEM is 128 MB; leave
# room for ray tiles and accumulators. Scenes whose blocks exceed this
# (~700k triangles at cs=16 -- VMEM pads a [C, 12, 16] table to
# [C, 16, 128], 10.6x its logical size) are traversed as a SEQUENCE of
# resident cluster groups, each one an ordinary walk, merged per-ray by
# elementwise nearest (kernels/traverse._walk_groups).
_PALLAS_BLOCK_BUDGET_BYTES = 96 * 1024 * 1024


_ACCEL_FORMAT_VERSION = 2


def _mesh_fingerprint(mesh: Mesh) -> np.ndarray:
    """64-bit content hash of the geometry an accel was built from:
    verts + tri_v bytes (sha1-truncated; ~50 ms at 1.6M tris)."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.ascontiguousarray(np.asarray(mesh.verts, np.float32)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(mesh.tri_v, np.int32)).tobytes())
    return np.frombuffer(h.digest()[:8], dtype=np.int64).copy()


def save_accel(path: str, accel: ClusterAccel,
               mesh: Optional[Mesh] = None) -> None:
    """Serialize a built accel to one .npz (atomic rename). Production
    serving builds once and ships the structure with the scene — the
    load path is a plain numpy read, no SAH/packing cost. Optional
    fields (None) are simply absent from the archive. Pass `mesh` to
    record a geometry fingerprint so load_accel can reject a cache that
    belongs to a different scene."""
    import os

    arrays = {"_version": np.int64(_ACCEL_FORMAT_VERSION)}
    if mesh is not None:
        arrays["_mesh_fp"] = _mesh_fingerprint(mesh)
    for name, value in accel._asdict().items():
        if value is not None:
            arrays[name] = np.asarray(value)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_accel(path: str, mesh: Optional[Mesh] = None,
               cluster_size: Optional[int] = None) -> ClusterAccel:
    """Inverse of save_accel; arrays land on the default device.
    With `mesh`, the stored geometry fingerprint must match (a stale
    cache for a different scene raises instead of silently rendering the
    wrong geometry); with `cluster_size`, the stored structure's cluster
    size must match."""
    with np.load(path) as z:
        if "_version" not in z.files:
            raise ValueError(
                f"accel file {path}: not a save_accel archive "
                f"(no _version field)")
        version = int(z["_version"])
        if version != _ACCEL_FORMAT_VERSION:
            raise ValueError(
                f"accel file {path}: format v{version}, "
                f"expected v{_ACCEL_FORMAT_VERSION}")
        if mesh is not None:
            if "_mesh_fp" not in z.files:
                raise ValueError(
                    f"accel file {path}: no mesh fingerprint recorded; "
                    f"cannot validate against the current scene")
            if int(z["_mesh_fp"][0]) != int(_mesh_fingerprint(mesh)[0]):
                raise ValueError(
                    f"accel file {path}: built from different geometry "
                    f"than the current scene (mesh fingerprint mismatch)")
        fields = {name: (jnp.asarray(z[name]) if name in z.files else None)
                  for name in ClusterAccel._fields}
    accel = ClusterAccel(**fields)
    if cluster_size is not None and accel.cluster_size != cluster_size:
        raise ValueError(
            f"accel file {path}: cluster_size {accel.cluster_size}, "
            f"expected {cluster_size}")
    return accel


def fits_pallas_vmem(accel: ClusterAccel) -> bool:
    """Whether the accel's kernel blocks fit ONE VMEM-resident group
    (diagnostic — larger scenes still traverse on the pallas backend via
    the grouped walk, one launch per group). VMEM tiles pad the minor dim
    to 128 lanes and the next dim to 8 sublanes."""

    def padded_bytes(a):
        s = a.shape
        return 4 * int(np.prod(s[:-2])) * (-(-s[-2] // 8) * 8) \
            * (-(-s[-1] // 128) * 128)

    biggest = max(padded_bytes(accel.pmt_blocks),
                  padded_bytes(accel.tri_blocks),
                  padded_bytes(accel.woop_blocks))
    return biggest + padded_bytes(accel.attr_blocks) \
        <= _PALLAS_BLOCK_BUDGET_BYTES


def refit_attr_planes(
    accel: ClusterAccel, mesh: Mesh,
    first_tri: Optional[np.ndarray] = None,
) -> ClusterAccel:
    """Refresh the kernel attribute planes from the LIVE mesh tables — the
    cheap (device-side, jit-safe) slice of the refit contract for use when
    colors/materials/normals are optimization parameters (inverse.fit):
    without it, the pallas forward pass shades with the attributes baked at
    build time while gradients flow to the live tables, so the descent
    direction is computed against a stale residual.

    Only the attribute planes are refreshed; bounds and triangle blocks
    still require a host rebuild when VERTICES move (build_cluster_accel).
    All outputs are stop_gradient'd: forward VALUES come from the refit
    planes, gradients flow through traverse._lazy_attrs as before.

    first_tri: [O] static first-triangle index per object (objid mode) —
    computed from mesh.obj_id when it is concrete; must be passed when
    calling under jit with a traced mesh."""
    sg = jax.lax.stop_gradient
    cs = accel.cluster_size
    c = accel.num_clusters
    valid = accel.slot_valid[:, None].astype(mesh.normals.dtype)
    if accel.attr_tables is not None:
        obj_plane = accel.attr_blocks[:, 3:4, :]  # static obj ids
        nrm = sg(mesh.normals)[accel.order] * valid  # [S, 3]
        planes_t = nrm.reshape(c, cs, 3)
        attr_blocks = jnp.concatenate(
            [planes_t.transpose(0, 2, 1), obj_plane], axis=1)
        attr_t = jnp.concatenate(
            [planes_t, accel.attr_t_blocks[:, :, 3:4]], axis=2)
        if first_tri is None:
            first_tri = first_tri_per_object(
                np.asarray(mesh.obj_id), accel.attr_tables.shape[0])
        tbl = jnp.concatenate(
            [sg(mesh.colors)[jnp.asarray(first_tri)], sg(mesh.materials)],
            axis=1)
        accel = accel._replace(attr_blocks=attr_blocks,
                               attr_t_blocks=attr_t, attr_tables=tbl)
        if accel.rest_ids is not None:
            rn = sg(mesh.normals)[accel.rest_ids]
            accel = accel._replace(rest_attrs=jnp.concatenate(
                [rn, accel.rest_attrs[:, 3:4]], axis=1))
        return accel
    attrs = jnp.concatenate(
        [mesh.normals, mesh.colors, mesh.materials[mesh.obj_id]], axis=1)
    attrs_p = sg(attrs)[accel.order] * valid
    attr_t = attrs_p.reshape(c, cs, -1)
    accel = accel._replace(attr_blocks=attr_t.transpose(0, 2, 1),
                           attr_t_blocks=attr_t)
    if accel.rest_ids is not None:
        accel = accel._replace(rest_attrs=sg(attrs)[accel.rest_ids])
    return accel


def packed_triangles(mesh: Mesh, accel: ClusterAccel) -> TriangleSoA:
    """Gather the Möller–Trumbore-ready triangle SoA in packed (cluster)
    order from the live vertex pool — differentiable w.r.t. mesh.verts.
    Padding slots get e1 = e2 = 0 (det 0 -> always miss), the TPU version of
    the reference's hard 8-exactly packing contract (simd_accel.rs:20-22)."""
    tv = mesh.tri_v[accel.order]
    va = mesh.verts[tv[:, 0]]
    vb = mesh.verts[tv[:, 1]]
    vc = mesh.verts[tv[:, 2]]
    m = accel.slot_valid[:, None].astype(mesh.verts.dtype)
    return TriangleSoA(v0=va, e1=(vb - va) * m, e2=(vc - va) * m)


def _cluster_scan(tri: TriangleSoA, accel: ClusterAccel, o, d, eps, nearest: bool,
                  t_max=INF):
    """Shared XLA cluster walk: scan clusters, slab-cull, intersect members.

    Pure-XLA semantics note: culled work is masked, not skipped (SIMD); the
    Pallas kernel (kernels/traverse.py) performs real tile-level skipping.
    """
    cs = accel.cluster_size
    c = accel.num_clusters
    v0 = tri.v0.reshape(c, cs, 3)
    e1 = tri.e1.reshape(c, cs, 3)
    e2 = tri.e2.reshape(c, cs, 3)
    slots = jnp.arange(c * cs, dtype=jnp.int32).reshape(c, cs)
    # Clamp near-zero components before the reciprocal: IEEE inf in the slab
    # test turns into NaN via 0 * inf when a ray origin sits exactly on a
    # cluster boundary (the reference's `recip` precompute has the same
    # latent issue, objects.rs:64-74); the clamp treats axis-parallel rays
    # as infinitesimally diverging, which only loosens culling.
    d_safe = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    inv_d = 1.0 / d_safe
    r = o.shape[0]
    tm = jnp.broadcast_to(jnp.asarray(t_max, dtype=o.dtype), (r,))

    def body(carry, blk):
        best_t, best_i, occ = carry
        bv0, be1, be2, bslot, bmin, bmax = blk
        limit = best_t if nearest else tm
        in_box = slab_test(o, inv_d, bmin, bmax, limit)
        t, valid = moller_trumbore(o[:, None, :], d[:, None, :],
                                   TriangleSoA(bv0, be1, be2),
                                   limit[:, None], eps)
        t = jnp.where(in_box[:, None], t, INF)
        if nearest:
            j = jnp.argmin(t, axis=1)
            tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            better = tj < best_t
            best_t = jnp.where(better, tj, best_t)
            best_i = jnp.where(better, bslot[j], best_i)
        else:
            occ = occ | (in_box & jnp.any(valid, axis=1))
        return (best_t, best_i, occ), None

    init = (jnp.full(r, INF, dtype=o.dtype),
            jnp.zeros(r, dtype=jnp.int32),
            jnp.zeros(r, dtype=bool))
    (t, i, occ), _ = jax.lax.scan(
        body, init,
        (v0, e1, e2, slots, accel.cluster_min, accel.cluster_max))
    return t, i, occ


def rest_triangles(mesh: Mesh, accel: ClusterAccel) -> TriangleSoA:
    """Rest-set triangle SoA from the LIVE vertex pool (differentiable) —
    the dense-path sibling of `packed_triangles`."""
    tv = mesh.tri_v[accel.rest_ids]
    va = mesh.verts[tv[:, 0]]
    vb = mesh.verts[tv[:, 1]]
    vc = mesh.verts[tv[:, 2]]
    return TriangleSoA(v0=va, e1=vb - va, e2=vc - va)


def nearest_hit_cluster(
    mesh: Mesh, accel: ClusterAccel, o, d, eps: float = 1e-8
) -> Hit:
    """Nearest hit through the cluster structure (XLA backend). Returns
    original triangle ids (accel.order applied). The rest set (small
    objects, see ClusterAccel.rest_blocks) merges in from a dense pass
    over the live vertex pool."""
    from raytracing_tpu.ops.trace import nearest_hit_brute

    tri = packed_triangles(mesh, accel)
    t, slot, _ = _cluster_scan(tri, accel, o, d, eps, nearest=True)
    tri_id = accel.order[slot]
    if accel.rest_ids is not None:
        rt = rest_triangles(mesh, accel)
        hb = nearest_hit_brute(rt, o, d, eps,
                               block=max(8, accel.rest_ids.shape[0]))
        better = hb.t < t
        t = jnp.minimum(t, hb.t)
        tri_id = jnp.where(better, accel.rest_ids[hb.tri], tri_id)
    return Hit(t=t, tri=tri_id, hit=jnp.isfinite(t))


def any_hit_cluster(
    mesh: Mesh, accel: ClusterAccel, o, d, t_max=INF, eps: float = 1e-8
) -> jnp.ndarray:
    from raytracing_tpu.ops.trace import any_hit_brute

    tri = packed_triangles(mesh, accel)
    _, _, occ = _cluster_scan(tri, accel, o, d, eps, nearest=False, t_max=t_max)
    if accel.rest_ids is not None:
        rt = rest_triangles(mesh, accel)
        occ = occ | any_hit_brute(rt, o, d, t_max, eps,
                                  block=max(8, accel.rest_ids.shape[0]))
    return occ
