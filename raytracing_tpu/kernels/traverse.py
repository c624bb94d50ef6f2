"""Pallas TPU megakernels: cluster-culled nearest-hit and any-hit.

This layer is the TPU-native replacement for the reference's AVX2 SIMD
kernels (/root/reference/src/simd_accel.rs): where the reference tests 8
triangles per `__m256` packet and walks packets/clusters with scalar
early-outs (main.rs:93-171), this traversal runs in two phases sized for the
TPU's strengths:

  phase 1 (`_flags_kernel`) — every ray tile tests ALL cluster AABBs in one
      vectorized [RAY_TILE, C] slab test (rays on sublanes, clusters on
      lanes; zero scalar ops) and emits a per-tile cluster visit bitmap.
  phase 2 (XLA glue) — the bitmap is compacted into per-tile visit lists
      (cluster ids + count) with a tiny stable argsort. This is the ray-
      coherence bet: rays in a camera tile enter the same few clusters.
  phase 3 (`_nearest_kernel` / `_any_kernel`) — per ray tile, a dynamic-
      trip-count loop walks ONLY the visited clusters; cluster ids and
      counts are scalar-prefetched into SMEM (fast scalar reads), the
      cluster's 128 triangles are tested with a lane-parallel
      Möller–Trumbore, and the running best-t tightens every iteration
      (the reference's progressive `closest_splat`, main.rs:127).

Data layout (chosen so kernels need zero transposes):
  rays     [R, 3]       -> blocks (RAY_TILE, 3); components read as
                           [RT, 1] sublane columns that lane-broadcast
  tris     [C, 9, CS]   -> per cluster: rows v0x v0y v0z e1x e1y e1z e2x
                           e2y e2z, triangles on lanes
  bounds   [6, C]       -> rows minx miny minz maxx maxy maxz, clusters on
                           lanes
  outputs  [R, 1]       -> best t (f32, +inf miss) and packed slot (i32)

Differentiability contract: the kernels return *discrete* results (slot id,
occlusion bit) plus a detached t; `nearest_hit_pallas` re-derives t
differentiably from the winning triangle (ops/intersect.moller_trumbore on
the gathered triangle), so gradients flow through the continuous
intersection math while traversal decisions stay detached (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tpu.accel.packets import ClusterAccel, packed_triangles
from raytracing_tpu.geometry.mesh import Mesh
from raytracing_tpu.ops.intersect import INF, TriangleSoA, moller_trumbore
from raytracing_tpu.ops.trace import Hit

RAY_TILE = 256
_TINY = 1e-20


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def pack_tri_blocks(mesh: Mesh, accel: ClusterAccel) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rearrange the packed triangle SoA into the kernel layouts:
    tris [C, 9, CS] and bounds [6, C]."""
    tri = packed_triangles(mesh, accel)
    cs = accel.cluster_size
    c = accel.num_clusters
    comp = jnp.concatenate([tri.v0, tri.e1, tri.e2], axis=1)  # [S, 9]
    blocks = comp.reshape(c, cs, 9).transpose(0, 2, 1)  # [C, 9, CS]
    bounds = jnp.concatenate([accel.cluster_min, accel.cluster_max], axis=1).T
    return blocks, bounds


def _ray_columns(o_ref, d_ref):
    """Split ray blocks into [RT, 1] component columns with safe recip dirs."""
    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]

    def inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < _TINY, _TINY, v)

    return (ox, oy, oz), (dx, dy, dz), (inv(dx), inv(dy), inv(dz))


def _flags_kernel(o_ref, d_ref, bounds_ref, flags_ref):
    """Phase 1: visit bitmap. [RT, C] slab test, OR over the ray tile."""
    o, _, inv_d = _ray_columns(o_ref, d_ref)
    (ox, oy, oz), (ix, iy, iz) = o, inv_d
    bx0, by0, bz0 = bounds_ref[0:1, :], bounds_ref[1:2, :], bounds_ref[2:3, :]
    bx1, by1, bz1 = bounds_ref[3:4, :], bounds_ref[4:5, :], bounds_ref[5:6, :]
    t1x, t2x = (bx0 - ox) * ix, (bx1 - ox) * ix
    t1y, t2y = (by0 - oy) * iy, (by1 - oy) * iy
    t1z, t2z = (bz0 - oz) * iz, (bz1 - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    hit = (tn <= tf) & (tf >= 0.0)  # [RT, C]
    # The whole [n_tiles, C] bitmap is one revisited output block (TPU block
    # shapes must divide (8, 128) or equal the array); each grid step writes
    # its own row.
    i = pl.program_id(0)
    flags_ref[pl.ds(i, 1), :] = jnp.any(hit, axis=0, keepdims=True).astype(
        jnp.int32
    )


def _mt_tile(o, d, blk, eps, t_limit):
    """Möller–Trumbore of the ray tile against one cluster block.

    o/d: tuples of [RT, 1]; blk: [9, CS] component rows. Returns t [RT, CS]
    with +inf on miss — the lane-parallel sibling of simd_accel.rs:282-331.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z = blk[0:1, :], blk[1:2, :], blk[2:3, :]
    e1x, e1y, e1z = blk[3:4, :], blk[4:5, :], blk[5:6, :]
    e2x, e2y, e2z = blk[6:7, :], blk[7:8, :], blk[8:9, :]
    # p = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = 1.0 / det
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = (sx * px + sy * py + sz * pz) * inv
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    valid = (
        (jnp.abs(det) >= eps)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
        & (t < t_limit)
    )
    return jnp.where(valid, t, INF)


def _nearest_kernel(cnt_ref, ids_ref, o_ref, d_ref, tri_ref, t_ref, i_ref, *,
                    cluster_size, eps):
    o, d, _ = _ray_columns(o_ref, d_ref)
    rt = o_ref.shape[0]
    t_ref[:] = jnp.full((rt, 1), INF, dtype=jnp.float32)
    i_ref[:] = jnp.zeros((rt, 1), dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rt, cluster_size), 1)
    i = pl.program_id(0)

    def body(j, _):
        c = ids_ref[i, j]
        blk = tri_ref[c]  # [9, CS]
        t = _mt_tile(o, d, blk, eps, t_ref[:])
        tmin = jnp.min(t, axis=1, keepdims=True)
        lmin = jnp.min(
            jnp.where(t == tmin, lane, cluster_size), axis=1, keepdims=True
        )
        better = tmin < t_ref[:]
        i_ref[:] = jnp.where(better, c * cluster_size + lmin, i_ref[:])
        t_ref[:] = jnp.where(better, tmin, t_ref[:])
        return 0

    jax.lax.fori_loop(0, cnt_ref[i], body, 0)


def _any_kernel(cnt_ref, ids_ref, o_ref, d_ref, tri_ref, occ_ref, *,
                cluster_size, eps, t_max):
    o, d, _ = _ray_columns(o_ref, d_ref)
    rt = o_ref.shape[0]
    occ_ref[:] = jnp.zeros((rt, 1), dtype=jnp.int32)
    limit = jnp.full((rt, 1), t_max, dtype=jnp.float32)
    i = pl.program_id(0)

    def body(j, _):
        c = ids_ref[i, j]
        blk = tri_ref[c]
        t = _mt_tile(o, d, blk, eps, limit)
        hit = jnp.any(jnp.isfinite(t), axis=1, keepdims=True)
        occ_ref[:] = jnp.where(hit, 1, occ_ref[:])
        return 0

    jax.lax.fori_loop(0, cnt_ref[i], body, 0)


def _pad_rays(o, d):
    r = o.shape[0]
    pad = (-r) % RAY_TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), dtype=o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], d.dtype), (pad, 3))]
        )
    return o, d, r


def _visit_lists(o, d, bounds, n_clusters, interpret):
    """Phases 1+2: per-tile cluster visit lists (ids, counts)."""
    rp = o.shape[0]
    n_tiles = rp // RAY_TILE
    flags = pl.pallas_call(
        _flags_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0)),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0)),
            pl.BlockSpec((6, n_clusters), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_tiles, n_clusters), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_clusters), jnp.int32),
        interpret=interpret,
    )(o, d, bounds)
    # Compact the bitmap into visit lists: stable argsort puts set flags
    # first while preserving the (near-to-far-ish) cluster order.
    ids = jnp.argsort(1 - flags, axis=1, stable=True).astype(jnp.int32)
    cnt = jnp.sum(flags, axis=1, dtype=jnp.int32)
    return ids, cnt


def _launch_walk(kernel, cnt, ids, o, d, blocks, out_dtype, interpret):
    rp = o.shape[0]
    n_tiles = rp // RAY_TILE
    c, _, cs = blocks.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 3), lambda i, *_: (i, 0)),
            pl.BlockSpec((RAY_TILE, 3), lambda i, *_: (i, 0)),
            pl.BlockSpec((c, 9, cs), lambda i, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0))
            for _ in out_dtype
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((rp, 1), dt) for dt in out_dtype]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cnt, ids, o, d, blocks)
    return outs


def nearest_hit_pallas(
    mesh: Mesh,
    accel: ClusterAccel,
    o: jnp.ndarray,
    d: jnp.ndarray,
    eps: float = 1e-8,
    interpret: bool | None = None,
) -> Hit:
    """Nearest hit via the Pallas megakernel. Returns original triangle ids;
    t is re-derived differentiably from the winning triangle so the kernel
    itself stays out of the gradient path."""
    if interpret is None:
        interpret = not _on_tpu()
    blocks, bounds = pack_tri_blocks(mesh, accel)
    blocks = jax.lax.stop_gradient(blocks)
    bounds = jax.lax.stop_gradient(bounds)
    op, dp, r = _pad_rays(jax.lax.stop_gradient(o), jax.lax.stop_gradient(d))
    ids, cnt = _visit_lists(op, dp, bounds, accel.num_clusters, interpret)
    kern = functools.partial(
        _nearest_kernel, cluster_size=accel.cluster_size, eps=eps
    )
    t_k, slot = _launch_walk(kern, cnt, ids, op, dp, blocks,
                             (jnp.float32, jnp.int32), interpret)
    t_k = t_k[:r, 0]
    slot = slot[:r, 0]
    hit = jnp.isfinite(t_k)
    # Differentiable refinement: recompute t for the (detached) winning
    # triangle from the live vertex pool.
    tri = packed_triangles(mesh, accel)
    tri_sel = TriangleSoA(tri.v0[slot], tri.e1[slot], tri.e2[slot])
    t_d, _ = moller_trumbore(o, d, tri_sel, INF, eps)
    t = jnp.where(hit, jnp.where(jnp.isfinite(t_d), t_d, t_k), INF)
    return Hit(t=t, tri=accel.order[slot], hit=hit)


def any_hit_pallas(
    mesh: Mesh,
    accel: ClusterAccel,
    o: jnp.ndarray,
    d: jnp.ndarray,
    eps: float = 1e-8,
    t_max: float = float("inf"),
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = not _on_tpu()
    blocks, bounds = pack_tri_blocks(mesh, accel)
    blocks = jax.lax.stop_gradient(blocks)
    bounds = jax.lax.stop_gradient(bounds)
    op, dp, r = _pad_rays(jax.lax.stop_gradient(o), jax.lax.stop_gradient(d))
    ids, cnt = _visit_lists(op, dp, bounds, accel.num_clusters, interpret)
    kern = functools.partial(
        _any_kernel, cluster_size=accel.cluster_size, eps=eps, t_max=t_max
    )
    (occ,) = _launch_walk(kern, cnt, ids, op, dp, blocks, (jnp.int32,),
                          interpret)
    return occ[:r, 0] != 0
