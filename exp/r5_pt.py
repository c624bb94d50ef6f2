"""Round-5 path-tracer decomposition: where do config-3's ~6 s go?

Times EACH of the five 131072-ray chunks of the production config-3
frame (800x800, 64 spp, 4 bounces, chunk_size=131072) at spp=8, then
runs knob ablations on the BUSIEST chunk. An earlier version of this
harness measured only chunk 0 — the top fifth of the frame, which is
almost all sky (paths die at bounce 0) — and concluded binning was a
30% loss; that conclusion was an artifact of the dead wavefront, not a
property of the workload. Per-chunk numbers below show the real mix.

Timing uses utils.timing.sync (host readback) — block_until_ready
returns early on this runtime (utils/timing.py docstring).

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

SPP = 8
CHUNK = 131072
R = 800 * 800


def time_chunk(scene, accel, gi_accel, cfg, pt, chunk_i, label, iters=2):
    ids = jnp.minimum(chunk_i * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32),
                      R - 1)
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

    sync(body(jax.random.PRNGKey(0)))
    best = float("inf")
    for k in range(iters):
        t0 = time.perf_counter()
        sync(body(jax.random.PRNGKey(k + 1)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s}: {best*1000:8.1f} ms ({best/SPP*1000:6.2f} "
          f"ms/sample)", flush=True)
    return best


def main():
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    cfg = RenderConfig(width=800, height=800, backend="pallas",
                       chunk_size=CHUNK)
    gi_accel = _auto_gi_accel(scene.mesh, accel, cfg)
    pt = ptm.PathTracerConfig(max_bounces=4, samples_per_pixel=SPP)

    times = []
    for i in range(5):
        times.append(time_chunk(scene, accel, gi_accel, cfg, pt, i,
                                f"chunk {i} default (gi_wq cs128)"))
    est = sum(times) / SPP * 64
    print(f"-> config-3 device estimate: {est:.2f} s (prod committed "
          f"adds dispatch)", flush=True)
    busy = max(range(5), key=lambda i: times[i])
    print(f"busiest chunk: {busy}", flush=True)

    for label, c, g in [
        ("bin_secondary=False", cfg.replace(bin_secondary=False), gi_accel),
        ("gi_wq=False (dyn walk)", cfg.replace(gi_wq=False), gi_accel),
        ("gi_accel=None (fine clusters)", cfg, None),
        ("gi_early_exit=False", cfg.replace(gi_early_exit=False), gi_accel),
    ]:
        time_chunk(scene, accel, g, c, pt, busy, f"chunk {busy} {label}")


main()
