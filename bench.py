"""Headline benchmark: primary rays/s per chip on the teapot scene.

Measures the nearest-hit traversal (Pallas megakernel, cluster accel) over
the reference workload's primary rays — 800x800 with 4 stratified samples =
2.56M rays/frame (/root/reference/src/main.rs:29-36, :321-365) against the
default two-teapots-and-ground scene (12,642 triangles). Baseline target
(BASELINE.md): 1e9 primary rays/s per v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.kernels.traverse import nearest_hit_pallas
from raytracing_tpu.models.camera import camera_rays

BASELINE_RAYS_PER_S = 1e9
CHUNK = 1 << 16


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4)
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=256)

    o, d = camera_rays(cfg)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n_rays = o.shape[0]
    n_chunks = n_rays // CHUNK
    o = o[: n_chunks * CHUNK].reshape(n_chunks, CHUNK, 3)
    d = d[: n_chunks * CHUNK].reshape(n_chunks, CHUNK, 3)
    measured = n_chunks * CHUNK

    mesh = scene.mesh

    @jax.jit
    def frame(o, d):
        def body(_, od):
            h = nearest_hit_pallas(mesh, accel, od[0], od[1],
                                   interpret=not on_tpu)
            return 0, (jnp.sum(h.t, where=h.hit), jnp.sum(h.hit))

        _, (tsum, hits) = jax.lax.scan(body, 0, (o, d))
        return tsum.sum(), hits.sum()

    # warmup / compile
    tsum, hits = jax.block_until_ready(frame(o, d))
    iters = 5 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        out = frame(o, d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rays_per_s = measured / dt

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_s_per_chip_teapot",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
