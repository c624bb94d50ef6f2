"""Round-5 path-tracer decomposition: where do config-3's 5.8 s go?

Times ONE 131072-ray chunk at spp=16 under ablations that isolate the
per-sample state sort (16 flat arrays x 3 bounces) from the walks. The
"nosort payloads" variant moves only (o, d, alive) through the re-bin
(WRONG image — throughput/radiance/orig left unpermuted — but the sort
network cost is exactly the production cost minus 8 payload columns),
bounding what any column-shrinking rework could save.

Run from repo root: timeout ... python - < exp/r5_pt.py
"""
import time

import jax
import jax.numpy as jnp

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.utils.timing import sync

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.models.camera import camera_rays_for_ids
from raytracing_tpu.models import path_tracer as ptm
from raytracing_tpu.models.whitted import _auto_gi_accel

SPP = 16
CHUNK = 131072


def time_chunk(scene, accel, gi_accel, cfg, pt, label, iters=2):
    ids = jnp.arange(CHUNK, dtype=jnp.int32)
    cam_cfg = cfg.replace(samples_per_pixel=1)

    @jax.jit
    def body(key):
        o, d = camera_rays_for_ids(ids, cam_cfg)

        def sample(acc, key_s):
            rgb = ptm.trace_paths(scene.mesh, accel, scene.sun, o, d,
                                  key_s, cfg, pt, gi_accel=gi_accel)
            return acc + rgb, None

        acc, _ = jax.lax.scan(sample, jnp.zeros((CHUNK, 3), jnp.float32),
                              jax.random.split(key, SPP))
        return acc

    r = sync(body(jax.random.PRNGKey(0)))
    best = float("inf")
    for k in range(iters):
        t0 = time.perf_counter()
        sync(body(jax.random.PRNGKey(k + 1)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s}: {best*1000:8.1f} ms "
          f"({best/SPP*1000:6.2f} ms/sample)", flush=True)
    return best


def main():
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    cfg = RenderConfig(width=800, height=800, backend="pallas",
                       chunk_size=CHUNK)
    gi_accel = _auto_gi_accel(scene.mesh, accel, cfg)
    pt = ptm.PathTracerConfig(max_bounces=4, samples_per_pixel=SPP)

    time_chunk(scene, accel, gi_accel, cfg, pt, "default (gi_wq cs128)")
    time_chunk(scene, accel, gi_accel, cfg.replace(bin_secondary=False),
               pt, "bin_secondary=False (no sorts, bad tiles)")
    time_chunk(scene, accel, gi_accel, cfg.replace(gi_wq=False), pt,
               "gi_wq=False (dyn walk)")
    time_chunk(scene, accel, None, cfg, pt, "gi_accel=None (fine clusters)")
    import raytracing_tpu.models.path_tracer as m
    orig_fn = m.trace_paths
    # nosort-payloads hack: monkeypatch bin_sort inside trace_paths to
    # move only the first 3 payloads (o, d, alive).
    from raytracing_tpu.kernels import binning as B
    real_bin_sort = B.bin_sort

    def lean_bin_sort(key, *payloads):
        if len(payloads) == 6:  # the state sort
            s, moved = real_bin_sort(key, *payloads[:3])
            return s, moved + payloads[3:]
        return real_bin_sort(key, *payloads)

    m.bin_sort = lean_bin_sort
    try:
        pass
    finally:
        pass
    # trace_paths imports bin_sort inside the function body from
    # kernels.binning, so patch the module attr instead.
    B.bin_sort = lean_bin_sort
    try:
        time_chunk(scene, accel, gi_accel, cfg.replace(gamma=2.2001),
                   pt, "state sort moves only o/d/alive (TIMING ONLY)")
    finally:
        B.bin_sort = real_bin_sort
        m.trace_paths = orig_fn


main()
