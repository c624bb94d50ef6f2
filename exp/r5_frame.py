"""Round-5 frame sweep: full 800x800x4spp reference frame under the new
knobs — bin_reflect_levels (skip the pure-reflect levels' payload sorts)
and gi_wq (DMA-prefetch bounce walks, needs gi_cluster_size=128).

Run from repo root: timeout ... python - < exp/r5_frame.py
"""
import time

import jax

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.models.whitted import render


def time_frame(scene, accel, cfg, iters=2):
    img = jax.block_until_ready(
        render(scene, cfg, accel=accel, key=jax.random.PRNGKey(0)))
    best = float("inf")
    for k in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(
            render(scene, cfg, accel=accel, key=jax.random.PRNGKey(k + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    base = RenderConfig(width=800, height=800, samples_per_pixel=4,
                        backend="pallas")
    variants = [
        ("r4-default (brl=T, gi64, dyn)",
         base.replace(bin_reflect_levels=True)),
        ("brl=F (skip reflect-level sorts)", base),
        ("brl=F + gi_wq cs128",
         base.replace(gi_wq=True, gi_cluster_size=128)),
        ("brl=T + gi_wq cs128",
         base.replace(bin_reflect_levels=True, gi_wq=True,
                      gi_cluster_size=128)),
        ("brl=F + gi_wq cs128 + chunk128k",
         base.replace(gi_wq=True, gi_cluster_size=128, chunk_size=131072)),
        ("brl=F + dyn gi128",
         base.replace(gi_cluster_size=128)),
    ]
    for name, cfg in variants:
        try:
            dt = time_frame(scene, accel, cfg)
            print(f"{name:42s}: {dt:6.3f} s  ({1/dt:.2f} fps)", flush=True)
        except Exception as e:
            print(f"{name:42s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
