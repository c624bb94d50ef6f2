"""Round-3: decompose phase 1+2 (extents / interval culling / top_k) in
context, consuming all outputs so nothing is DCE'd.

Run: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_p12.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.kernels import traverse as tv
from raytracing_tpu.models.camera import block_permutation, camera_rays
from raytracing_tpu.ops.intersect import INF


def ray_pack():
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4)
    o, d = camera_rays(cfg)
    spp, h, w = o.shape[:3]
    perm, _ = block_permutation(spp, h, w, 16, 16)
    on = np.asarray(o).reshape(-1, 3)[np.asarray(perm)]
    dn = np.asarray(d).reshape(-1, 3)[np.asarray(perm)]
    n = on.shape[0]
    return jnp.asarray(np.concatenate(
        [on.T, np.ones((1, n), np.float32), dn.T,
         np.ones((1, n), np.float32)], axis=0)), n


def chain(f, rays8, iters=20):
    s = jax.block_until_ready(f(jnp.float32(0.0), rays8))[0]
    best = float("inf")
    for _ in range(3):
        st = s
        t0 = time.perf_counter()
        for _ in range(iters):
            st = f(st, rays8)[0]
        jax.block_until_ready(st)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    scene = build_default_scene(t=0.0)
    rays8, n = ray_pack()
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    interp = not tv._on_tpu()
    cmin, cmax = accel.cluster_min, accel.cluster_max

    @jax.jit
    def null(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return (jnp.sum(r[4, :8]) * 1e-20,)

    dt_null = chain(null, rays8)
    print(f"null: {dt_null*1e3:.3f} ms", flush=True)

    @jax.jit
    def extents(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        rp, _ = tv._pad_rays_soa(r)
        lo, hi = tv._tile_extents_pallas(rp, tv.RAY_TILE, interp)
        return (jnp.sum(lo) * 1e-20 + jnp.sum(hi) * 1e-20,)

    dt = chain(extents, rays8)
    print(f"extents: {(dt-dt_null)*1e3:.3f} ms", flush=True)

    def interval_parts(r8, with_topk):
        rp, _ = tv._pad_rays_soa(r8)
        lo, hi = tv._tile_extents_pallas(rp, tv.RAY_TILE, interp)
        o_lo, o_hi = lo[:, 0:3], hi[:, 0:3]
        d_lo, d_hi = lo[:, 4:7], hi[:, 4:7]
        # inlined interval math from _visit_lists_single
        t_near_lb = t_far_ub = None
        for k in range(3):
            spans0 = (d_lo[:, k] <= 0.0) & (d_hi[:, k] >= 0.0)
            dl = jnp.where(jnp.abs(d_lo[:, k]) < 1e-20, 1e-20, d_lo[:, k])
            dh = jnp.where(jnp.abs(d_hi[:, k]) < 1e-20, 1e-20, d_hi[:, k])
            i_lo = (1.0 / dh)[:, None]
            i_hi = (1.0 / dl)[:, None]
            e_lo = cmin[None, :, k] - o_hi[:, k:k + 1]
            e_hi = cmax[None, :, k] - o_lo[:, k:k + 1]
            p1, p2 = e_lo * i_lo, e_lo * i_hi
            p3, p4 = e_hi * i_lo, e_hi * i_hi
            tmin_ax = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
            tmax_ax = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
            unb = spans0[:, None]
            tmin_ax = jnp.where(unb, -INF, tmin_ax)
            tmax_ax = jnp.where(unb, INF, tmax_ax)
            t_near_lb = tmin_ax if k == 0 else jnp.maximum(t_near_lb, tmin_ax)
            t_far_ub = tmax_ax if k == 0 else jnp.minimum(t_far_ub, tmax_ax)
        flags = (t_near_lb <= t_far_ub) & (t_far_ub >= 0.0)
        keys = jnp.where(flags, t_near_lb, INF)
        if not with_topk:
            return (jnp.sum(keys, where=jnp.isfinite(keys)) * 1e-20 +
                    jnp.sum(flags).astype(jnp.float32) * 1e-20)
        neg, ids = jax.lax.top_k(-keys, 128)
        cnt = jnp.sum(flags, axis=1, dtype=jnp.int32)
        return (jnp.sum(ids).astype(jnp.float32) * 1e-20 +
                jnp.sum(cnt).astype(jnp.float32) * 1e-20 +
                jnp.sum(neg, where=jnp.isfinite(neg)) * 1e-20)

    @jax.jit
    def interval_only(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return (interval_parts(r, False),)

    dt = chain(interval_only, rays8)
    print(f"extents+interval (no topk): {(dt-dt_null)*1e3:.3f} ms",
          flush=True)

    @jax.jit
    def with_topk(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return (interval_parts(r, True),)

    dt = chain(with_topk, rays8)
    print(f"extents+interval+topk(128): {(dt-dt_null)*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
