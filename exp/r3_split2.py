"""Round-3 decomposition: where do the ~3 ms of the teapot nearest-hit
go, now that visit lists average 1.9 clusters/tile?

Components measured (all chained, null-subtracted):
  walk-only   — _walk_groups with visit lists precomputed as closure
                constants (no phase 1, no rest merge)
  walk+p12    — _walk_groups with live phase 1+2
  full        — nearest_hit_soa (adds the rest-set merge + slicing)
Each at early_exit on, pmto variant (the current best config).

Run: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_split2.py
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
    o_shared = jnp.zeros(3, jnp.float32)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    interp = not tv._on_tpu()
    tv._EARLY_EXIT_MIN_CLUSTERS = 0  # early exit ON everywhere

    @jax.jit
    def null(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return (jnp.sum(r[4, :8]) * 1e-20,)

    dt_null = chain(null, rays8)
    print(f"null: {dt_null*1e3:.3f} ms", flush=True)

    # Precomputed visit lists as closure constants.
    rp0, _ = tv._pad_rays_soa(rays8)
    ids_c, tnear_c, cnt_c = jax.block_until_ready(tv._tile_visit_lists_soa(
        rp0, accel.cluster_min, accel.cluster_max, tv.RAY_TILE,
        interpret=interp))
    blocks = (tv._fold_origin(accel.pmt_blocks, jnp.zeros(3)),)
    import functools
    kern = functools.partial(
        tv._walk_kernel, cluster_size=accel.cluster_size, eps=1e-8,
        variant="pmto", nearest=True, t_max=float("inf"), n_attrs=0,
        unroll=tv.VISIT_UNROLL, per_ray_tmax=False, ray_tile=tv.RAY_TILE,
        ids_mode=tv.IDS_MODE, early_exit=True)

    @jax.jit
    def walk_only(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        rp, _ = tv._pad_rays_soa(r)
        t, s, _ = tv._launch_walk(kern, cnt_c, ids_c, rp, blocks, interp,
                                  tnear=tnear_c)[0:2] + (None,)
        return (jnp.sum(t, where=jnp.isfinite(t)) * 1e-20,)

    dt = chain(walk_only, rays8)
    print(f"walk-only (const lists): {(dt-dt_null)*1e3:.3f} ms", flush=True)

    @jax.jit
    def walk_p12(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        rp, _ = tv._pad_rays_soa(r)
        t, s, _ = tv._walk_groups(accel, rp, 1e-8, interp, "pmt",
                                  nearest=True, t_max=float("inf"),
                                  n_attrs=0, shared_origin=o_shared)
        return (jnp.sum(t, where=jnp.isfinite(t)) * 1e-20,)

    dt = chain(walk_p12, rays8)
    print(f"walk+phase12: {(dt-dt_null)*1e3:.3f} ms", flush=True)

    @jax.jit
    def full(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        t, _ = tv.nearest_hit_soa(accel, r, shared_origin=o_shared)
        return (jnp.sum(t, where=jnp.isfinite(t)) * 1e-20,)

    dt = chain(full, rays8)
    print(f"full nearest_hit_soa: {(dt-dt_null)*1e3:.3f} ms "
          f"-> {n/max(dt-dt_null,1e-9)/1e6:.1f} Mrays/s", flush=True)

    # walk-only at different SUBTILES to expose per-step fixed cost
    for st_ in (8, 16):
        old = tv.SUBTILES
        tv.SUBTILES = st_
        kern2 = functools.partial(
            tv._walk_kernel, cluster_size=accel.cluster_size, eps=1e-8,
            variant="pmto", nearest=True, t_max=float("inf"), n_attrs=0,
            unroll=tv.VISIT_UNROLL, per_ray_tmax=False,
            ray_tile=tv.RAY_TILE, ids_mode=tv.IDS_MODE, early_exit=True)

        @jax.jit
        def walk_st(state, r8):
            r = r8.at[4, 0].add(state * 1e-12)
            rp, _ = tv._pad_rays_soa(r)
            out = tv._launch_walk(kern2, cnt_c, ids_c, rp, blocks, interp,
                                  subtiles=st_, tnear=tnear_c)
            t = out[0]
            return (jnp.sum(t, where=jnp.isfinite(t)) * 1e-20,)

        dt = chain(walk_st, rays8)
        print(f"walk-only SUBTILES={st_}: {(dt-dt_null)*1e3:.3f} ms",
              flush=True)
        tv.SUBTILES = old

    tv._EARLY_EXIT_MIN_CLUSTERS = 2048


if __name__ == "__main__":
    main()
