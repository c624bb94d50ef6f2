"""Per-chunk cost map of the Whitted frame: times the production chunk
program (render_rays on camera rays derived from the chunk index) for
every chunk of the reference 800x800x4spp frame, under each config of
interest. Shows WHERE the frame's seconds live (which chunks, how skewed)
so GI-level optimizations can be judged against the busy tail, not the
mean. Run on the chip from the repo root: python - [cfg] < exp/r4_chunkmap.py
"""
import sys
import time

import jax
import jax.numpy as jnp

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.models.camera import block_ray_ids, camera_rays_for_ids
from raytracing_tpu.models.whitted import render_rays


def main():
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    gi = build_cluster_accel(scene.mesh, cluster_size=64, variants=("pmt",))
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4,
                       backend="pallas", bin_shadow=False)
    chunk = cfg.chunk_size
    nc = (800 * 800 * 4) // chunk
    mesh, sun = scene.mesh, scene.sun

    @jax.jit
    def body(i, key_c):
        ids = block_ray_ids(i, chunk, cfg, 16, 16)
        o_c, d_c = camera_rays_for_ids(ids, cfg)
        rgb = render_rays(mesh, accel, sun, o_c, d_c, key_c, cfg,
                          gi_accel=gi)
        return jnp.sum(rgb)

    key = jax.random.PRNGKey(0)
    jax.block_until_ready(body(jnp.int32(5), key))
    times = []
    for i in range(nc):
        best = float("inf")
        for r in range(3):
            k = jax.random.fold_in(key, i * 7 + r)
            t0 = time.perf_counter()
            jax.block_until_ready(body(jnp.int32(i), k))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    import numpy as np

    t = np.array(times)
    print("per-chunk ms:", " ".join(f"{x*1e3:.1f}" for x in t))
    print(f"sum {t.sum():.3f}s mean {t.mean()*1e3:.1f}ms "
          f"p50 {np.percentile(t,50)*1e3:.1f} p90 {np.percentile(t,90)*1e3:.1f} "
          f"max {t.max()*1e3:.1f}ms")


if __name__ == "__main__":
    main()
