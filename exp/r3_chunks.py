"""Per-chunk full-pipeline cost across the whole reference frame, then a
gi_cap_frac sweep on the busiest chunk.

The frame averages ~57 ms/chunk (2.27 s / 40) but a sky-heavy chunk's
full render_rays prefix measures 22.4 ms (exp/frame_breakdown.py) — the
gap is the busy chunks' GI levels. This prints the actual distribution,
then sweeps the two-phase t_cap (config.gi_cap_frac) on the busiest
chunk: GI rays mostly terminate within a few tens of units, so a capped
phase 1 collapses their tile frustums while the sky-bound survivors pay
a cheap uncapped phase 2.

Run: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_chunks.py
"""
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
    on_tpu = jax.default_backend() == "tpu"
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    gi_accel = build_cluster_accel(scene.mesh, cluster_size=64,
                                   variants=("pmt",))
    mesh, sun = scene.mesh, scene.sun
    chunk = 65536

    def body_for(cfg):
        def body(i, key_c):
            ids = block_ray_ids(i, chunk, cfg, 16, 16)
            o_c, d_c = camera_rays_for_ids(ids, cfg)
            return render_rays(mesh, accel, sun, o_c, d_c, key_c, cfg,
                               gi_accel=gi_accel)
        return jax.jit(body)

    base = RenderConfig(width=800, height=800, samples_per_pixel=4,
                        backend="pallas" if on_tpu else "cluster",
                        bin_shadow=False)
    jb = body_for(base)
    nc = (800 * 800 * 4) // chunk
    key = jax.random.PRNGKey(0)
    # warm
    jax.block_until_ready(jb(0, key))
    costs = []
    for i in range(nc):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        jax.block_until_ready(jb(i, k))
        costs.append(time.perf_counter() - t0)
    tot = sum(costs)
    print("per-chunk ms:", " ".join(f"{c*1e3:.1f}" for c in costs),
          flush=True)
    print(f"sum {tot:.3f} s  mean {tot/nc*1e3:.1f} ms  "
          f"max {max(costs)*1e3:.1f} ms @ chunk {costs.index(max(costs))}",
          flush=True)



if __name__ == "__main__":
    main()
