"""Split the headline traversal cost into phase 1+2 (extents + interval
culling + top_k visit lists) vs phase 3 (the walk kernel), and measure
the batched front-to-back early exit on the teapot scene.

Run on the chip: python exp/phase_split.py
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
    # Restore traverse's tunables even if a sweep configuration
    # raises mid-run (ADVICE r2: module globals leaked otherwise).
    import raytracing_tpu.kernels.traverse as _tv
    _DEFADV = {k: getattr(_tv, k) for k in
               ('RAY_TILE', 'SUBTILES', 'VISIT_UNROLL',
                'EARLY_EXIT_BATCH', '_EARLY_EXIT_MIN_CLUSTERS',
                '_MAX_VISITS')}
    try:
        _main_body()
    finally:
        for k, v in _DEFADV.items():
            setattr(_tv, k, v)


def _main_body():
    scene = build_default_scene(t=0.0)
    rays8, n = ray_pack()
    o_shared = jnp.zeros(3, jnp.float32)
    accel = build_cluster_accel(scene.mesh, cluster_size=16,
                                variants=("pmt",))
    interp = not tv._on_tpu()

    @jax.jit
    def null(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return (jnp.sum(r[4, :8]) * 1e-20,)

    dt_null = chain(null, rays8)
    print(f"null: {dt_null*1e3:.3f} ms", flush=True)

    @jax.jit
    def phase1(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        rp, _ = tv._pad_rays_soa(r)
        ids, tnear, cnt = tv._tile_visit_lists_soa(
            rp, accel.cluster_min, accel.cluster_max, tv.RAY_TILE,
            interpret=interp)
        return (jnp.sum(cnt).astype(jnp.float32) * 1e-20
                + jnp.sum(ids[:, :1]).astype(jnp.float32) * 1e-20,)

    dt_p1 = chain(phase1, rays8)
    print(f"phase1+2 (extents+cull+topk): {(dt_p1-dt_null)*1e3:.3f} ms",
          flush=True)

    @jax.jit
    def extents_only(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        rp, _ = tv._pad_rays_soa(r)
        lo, hi = tv._tile_extents_pallas(rp, tv.RAY_TILE, interp)
        return (jnp.sum(lo) * 1e-20 + jnp.sum(hi) * 1e-20,)

    dt_ex = chain(extents_only, rays8)
    print(f"extents only: {(dt_ex-dt_null)*1e3:.3f} ms", flush=True)

    for ee in (False, True):
        tv._EARLY_EXIT_MIN_CLUSTERS = 0 if ee else 2048

        @jax.jit
        def frame(state, r8):
            r = r8.at[4, 0].add(state * 1e-12)
            t, _ = tv.nearest_hit_soa(accel, r, shared_origin=o_shared)
            hit = jnp.isfinite(t)
            return (jnp.sum(t, where=hit) * 1e-20 +
                    jnp.sum(hit).astype(jnp.float32) * 0.0,)

        dt = chain(frame, rays8)
        mrs = n / max(dt - dt_null, 1e-9) / 1e6
        print(f"full early_exit={int(ee)}: {(dt-dt_null)*1e3:.3f} ms "
              f"-> {mrs:7.1f} Mrays/s", flush=True)
    tv._EARLY_EXIT_MIN_CLUSTERS = 2048


if __name__ == "__main__":
    main()
