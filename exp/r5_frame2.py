"""Round-5b frame sweep: chunk-size scaling of the reference frame under
honest readback timing (utils.timing.sync — block_until_ready returns
early on this runtime, see utils/timing.py).

The production frame is 40 chunks of 65,536 rays; each chunk pays fixed
costs (dispatch ~2-3 ms, per-level glue, walk grid setup) that halving
the chunk count amortizes — IF the 2x-larger bounce wavefronts (720k ->
1.44M rays at level 2) don't lose more in the walk.

Run from repo root: timeout ... python - < exp/r5_frame2.py
"""
import time

import jax

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.utils.timing import sync

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.models.whitted import render


def time_frame(scene, accel, cfg, iters=2):
    sync(render(scene, cfg, accel=accel, key=jax.random.PRNGKey(0)))
    best = float("inf")
    for k in range(iters):
        t0 = time.perf_counter()
        sync(render(scene, cfg, accel=accel, key=jax.random.PRNGKey(k + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    base = RenderConfig(width=800, height=800, samples_per_pixel=4,
                        backend="pallas")
    variants = [
        ("default (chunk 64Ki, 40 chunks)", base),
        ("chunk 128Ki (20 chunks)", base.replace(chunk_size=131072)),
        ("chunk 256Ki (10 chunks)", base.replace(chunk_size=262144)),
        ("chunk 128Ki + gi_ray_tile 512",
         base.replace(chunk_size=131072, gi_ray_tile=512)),
    ]
    for name, cfg in variants:
        try:
            dt = time_frame(scene, accel, cfg)
            print(f"{name:42s}: {dt:6.3f} s  ({1/dt:.2f} fps)", flush=True)
        except Exception as e:
            print(f"{name:42s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


main()
