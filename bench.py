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
from raytracing_tpu.kernels.traverse import nearest_hit_soa
from raytracing_tpu.models.camera import block_permutation, camera_rays

BASELINE_RAYS_PER_S = 1e9


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4)
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)

    o, d = camera_rays(cfg)
    spp, h, w = o.shape[:3]
    perm, _ = block_permutation(spp, h, w, 16, 16)  # 16x16-px x 4spp = 1024-ray tiles
    # SoA ray pack [8, N] in block order, built host-side (static camera).
    on = np.asarray(o).reshape(-1, 3)[np.asarray(perm)]
    dn = np.asarray(d).reshape(-1, 3)[np.asarray(perm)]
    measured = on.shape[0]
    # SoA rows: ox oy oz 1 dx dy dz ALIVE (row 7 = 1.0 marks live lanes;
    # see kernels.traverse.rays_to_soa).
    rays8 = jnp.asarray(
        np.concatenate(
            [on.T, np.ones((1, measured), np.float32),
             dn.T, np.ones((1, measured), np.float32)], axis=0
        )
    )

    @jax.jit
    def frame(rays8):
        t, _ = nearest_hit_soa(accel, rays8, interpret=not on_tpu)
        hit = jnp.isfinite(t)
        return jnp.sum(t, where=hit), jnp.sum(hit)

    # warmup / compile — and a sanity gate: on the teapot frame roughly
    # half the primary rays hit geometry. A broken kernel (or an all-dead
    # ray pack) would "win" the benchmark by tracing nothing; refuse to
    # report a number unless the hit count is plausible.
    tsum, hits = jax.block_until_ready(frame(rays8))
    hit_frac = float(hits) / measured
    assert 0.2 < hit_frac < 0.9, f"implausible hit fraction {hit_frac:.3f}"
    iters = 20 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        out = frame(rays8)
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
