"""Sweep (chunk_size, gi_accel cluster size) on the full Whitted frame.

Frame timings use distinct RNG keys per call (chunk programs' inputs are
unique already). Run on the real chip: python exp/sweep_frame.py
"""
import time

import jax

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.models.whitted import render


from raytracing_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    on_tpu = jax.default_backend() == "tpu"
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    gi_accels = {None: None}
    for gcs in (64, 128):
        gi_accels[gcs] = build_cluster_accel(scene.mesh, cluster_size=gcs,
                                             variants=("pmt",))

    for chunk in (16384, 32768, 65536, 131072):
        for gcs, gacc in gi_accels.items():
            for pso in ((False, True) if gcs == 128 else (True,)):
                cfg = RenderConfig(width=800, height=800,
                                   samples_per_pixel=4,
                                   backend="pallas" if on_tpu else "cluster",
                                   chunk_size=chunk,
                                   primary_shared_origin=pso)
                img = jax.block_until_ready(
                    render(scene, cfg, accel=accel, gi_accel=gacc))
                best = float("inf")
                for k in (1, 2):
                    t0 = time.perf_counter()
                    img = jax.block_until_ready(
                        render(scene, cfg, accel=accel, gi_accel=gacc,
                               key=jax.random.PRNGKey(k)))
                    best = min(best, time.perf_counter() - t0)
                print(f"chunk={chunk:6d} gi_cs={gcs} pso={int(pso)} "
                      f"-> {best:.3f} s/frame", flush=True)


if __name__ == "__main__":
    main()
