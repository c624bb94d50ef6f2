"""Round-3 probe: walk-variant shootout + visit-list statistics on the
teapot primary pack.

Measures nearest_hit_soa under each intersector variant, with the batched
front-to-back early exit on/off, and prints the phase-2 visit-count
distribution (the number of clusters each 1024-ray tile walks) — the
quantity that sets the walk kernel's work.

Run on the chip: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_probe.py
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

    # ---- visit-count statistics -------------------------------------
    rp, _ = tv._pad_rays_soa(rays8)
    ids, tnear, cnt = tv._tile_visit_lists_soa(
        rp, accel.cluster_min, accel.cluster_max, tv.RAY_TILE,
        interpret=interp)
    c = np.asarray(cnt)
    print(f"tiles={c.size} C={accel.num_clusters} CS={accel.cluster_size}")
    print(f"visit counts: mean={c.mean():.1f} median={np.median(c):.0f} "
          f"p90={np.percentile(c, 90):.0f} max={c.max()} "
          f"total_visits={c.sum()}")
    print(f"tri tests/ray = {c.mean() * accel.cluster_size:.0f}")

    @jax.jit
    def null(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return (jnp.sum(r[4, :8]) * 1e-20,)

    dt_null = chain(null, rays8)
    print(f"null: {dt_null*1e3:.3f} ms", flush=True)

    def bench(variant, shared, ee):
        tv._EARLY_EXIT_MIN_CLUSTERS = 0 if ee else 10 ** 9

        @jax.jit
        def frame(state, r8):
            r = r8.at[4, 0].add(state * 1e-12)
            t, _ = tv.nearest_hit_soa(
                accel, r, variant=variant,
                shared_origin=o_shared if shared else None)
            hit = jnp.isfinite(t)
            return (jnp.sum(t, where=hit) * 1e-20 +
                    jnp.sum(hit).astype(jnp.float32) * 0.0,)

        dt = chain(frame, rays8)
        mrs = n / max(dt - dt_null, 1e-9) / 1e6
        tag = variant + ("+o" if shared else "") + (" ee" if ee else "")
        print(f"{tag:12s}: {(dt-dt_null)*1e3:.3f} ms -> {mrs:7.1f} Mrays/s",
              flush=True)

    for ee in (False, True):
        bench("pmt", False, ee)
        bench("pmtt", False, ee)
        bench("pmt", True, ee)   # -> pmto
    tv._EARLY_EXIT_MIN_CLUSTERS = 2048


if __name__ == "__main__":
    main()
