"""Round 2 of the tile sweep: pmto (shared-origin) variant at rt=1024,
SUBTILES in {16, 32, 64}, cluster_size in {16, 32, 64}, plus ku=2 for
cs=16 (fused pairs = effective 32-wide ops on 16-tight lists)."""
import sys
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
    s, aux = jax.block_until_ready(f(jnp.float32(0.0), rays8))
    best = float("inf")
    for _ in range(3):
        st = s
        t0 = time.perf_counter()
        for _ in range(iters):
            st, _ = f(st, rays8)
        jax.block_until_ready(st)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, aux


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
    cs_list = [16, 32, 64]
    accels = {cs: build_cluster_accel(scene.mesh, cluster_size=cs,
                                      variants=("pmt",))
              for cs in cs_list}

    @jax.jit
    def null(state, r8):
        r = r8.at[4, 0].add(state * 1e-12)
        return jnp.sum(r[4, :8]) * 1e-20, jnp.int32(0)

    dt_null, _ = chain(null, rays8)
    print(f"null chain: {dt_null*1e3:.3f} ms", flush=True)

    for st_ in (16, 32, 64):
        tv.SUBTILES = st_
        for cs in cs_list:
            accel = accels[cs]
            for ku in ((1, 2) if cs == 16 else (1,)):
                tv.VISIT_UNROLL = ku

                @jax.jit
                def frame(state, r8):
                    r = r8.at[4, 0].add(state * 1e-12)
                    t, _ = tv.nearest_hit_soa(accel, r,
                                              shared_origin=o_shared)
                    hit = jnp.isfinite(t)
                    return jnp.sum(t, where=hit) * 1e-20, jnp.sum(hit)

                try:
                    dt, hits = chain(frame, rays8)
                except Exception as e:  # noqa: BLE001
                    print(f"st={st_:2d} cs={cs:3d} ku={ku} FAILED: "
                          f"{type(e).__name__}", flush=True)
                    continue
                hf = float(hits) / n
                mrs = n / max(dt - dt_null, 1e-9) / 1e6
                print(f"st={st_:2d} cs={cs:3d} ku={ku} hit={hf:.3f} "
                      f"{dt*1e3:7.3f} ms -> {mrs:7.1f} Mrays/s",
                      flush=True)
                tv.VISIT_UNROLL = 1
    tv.SUBTILES = 4


if __name__ == "__main__":
    main()
