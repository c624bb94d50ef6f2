"""Round-3 large-scene tuning: EE batch x cluster size at 404k tris,
plus a phase split. Pooling stays off (generic pack path).

Run: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_large.py [levels]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import subdivided_teapot_mesh
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


def chain(f, rays8, iters=5):
    s = jax.block_until_ready(f(jnp.float32(0.0), rays8))[0]
    best = float("inf")
    for _ in range(2):
        st = s
        t0 = time.perf_counter()
        for _ in range(iters):
            st = f(st, rays8)[0]
        jax.block_until_ready(st)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    tv._PHASE2_SUPERTILE = 1
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mesh = subdivided_teapot_mesh(levels=levels)
    print(f"{mesh.tri_v.shape[0]} tris", flush=True)
    rays8, n = ray_pack()

    @jax.jit
    def null(state, r8):
        r = r8.at[0, 0].add(state * 1e-12)
        return (jnp.sum(r[0, :8]) * 1e-20,)

    dt_null = chain(null, rays8)
    print(f"null: {dt_null*1e3:.2f} ms", flush=True)

    for cs in (64, 128):
        accel = build_cluster_accel(mesh, cluster_size=cs,
                                    variants=("pmt",))
        jax.block_until_ready(accel.cluster_min)

        # phase 1+2 cost alone
        @jax.jit
        def p12(state, r8):
            r = r8.at[0, 0].add(state * 1e-12)
            rp, _ = tv._pad_rays_soa(r)
            ids, tn, cnt = tv._tile_visit_lists_soa(
                rp, accel.cluster_min, accel.cluster_max, tv.RAY_TILE,
                interpret=False)
            return (jnp.sum(cnt).astype(jnp.float32) * 1e-20 +
                    jnp.sum(ids[:, :1]).astype(jnp.float32) * 1e-20 +
                    jnp.sum(tn, where=jnp.isfinite(tn)) * 1e-20,)

        dt = chain(p12, rays8)
        print(f"cs={cs}: phase12 {(dt-dt_null)*1e3:.2f} ms", flush=True)

        for eb in (1, 2, 4):
            tv._ee_batch_for = lambda _cs, _eb=eb: _eb
            real_min = eb

            @jax.jit
            def step(state, r8):
                r = r8.at[0, 0].add(state * 1e-12)
                t, _ = tv.nearest_hit_soa(accel, r)
                hit = jnp.isfinite(t)
                return (jnp.sum(t, where=hit) * 1e-20 +
                        jnp.sum(hit).astype(jnp.float32) * 0.0,)

            dt = chain(step, rays8)
            print(f"cs={cs} EB={eb} (eff {real_min}): "
                  f"{(dt-dt_null)*1e3:.2f} ms -> "
                  f"{n/max(dt-dt_null,1e-9)/1e6:.1f} Mrays/s", flush=True)
        del accel


if __name__ == "__main__":
    main()
