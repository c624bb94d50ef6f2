"""Round-3 sweep: full nearest_hit_soa throughput vs (RAY_TILE, SUBTILES,
_MAX_VISITS, EARLY_EXIT_BATCH) with early exit on, pmto variant.

Run: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_sweep.py
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

DEFAULTS = dict(RAY_TILE=tv.RAY_TILE, SUBTILES=tv.SUBTILES,
                _MAX_VISITS=tv._MAX_VISITS,
                EARLY_EXIT_BATCH=tv.EARLY_EXIT_BATCH,
                _EARLY_EXIT_MIN_CLUSTERS=tv._EARLY_EXIT_MIN_CLUSTERS)


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

    @jax.jit
    def null(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return (jnp.sum(r[4, :8]) * 1e-20,)

    dt_null = chain(null, rays8)
    print(f"null: {dt_null*1e3:.3f} ms", flush=True)

    def run(tag, **over):
        try:
            for k, v in {**DEFAULTS, **over}.items():
                setattr(tv, k, v)

            @jax.jit
            def frame(state, r8):
                r = r8.at[4, 0].add(state * 1e-12)
                t, _ = tv.nearest_hit_soa(accel, r, shared_origin=o_shared)
                hit = jnp.isfinite(t)
                return (jnp.sum(t, where=hit) * 1e-20 +
                        jnp.sum(hit).astype(jnp.float32) * 0.0,)

            dt = chain(frame, rays8)
            mrs = n / max(dt - dt_null, 1e-9) / 1e6
            print(f"{tag:32s}: {(dt-dt_null)*1e3:.3f} ms -> "
                  f"{mrs:7.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"{tag:32s}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            for k, v in DEFAULTS.items():
                setattr(tv, k, v)

    run("base rt=1024 st=8 w=128 ec=8")
    run("w=64", _MAX_VISITS=64)
    run("ec=4", EARLY_EXIT_BATCH=4)
    run("ec=2", EARLY_EXIT_BATCH=2)
    run("rt=2048 st=4", RAY_TILE=2048, SUBTILES=4)
    run("rt=2048 st=4 w=64", RAY_TILE=2048, SUBTILES=4, _MAX_VISITS=64)
    run("rt=4096 st=2", RAY_TILE=4096, SUBTILES=2)
    run("rt=4096 st=2 w=64", RAY_TILE=4096, SUBTILES=2, _MAX_VISITS=64)
    run("rt=4096 st=2 w=64 ec=4", RAY_TILE=4096, SUBTILES=2,
        _MAX_VISITS=64, EARLY_EXIT_BATCH=4)
    run("rt=2048 st=8", RAY_TILE=2048, SUBTILES=8)


if __name__ == "__main__":
    main()
