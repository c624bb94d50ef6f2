"""Extended benchmark suite — one JSON line per metric.

Covers the BASELINE.md targets beyond the headline primary-rays/s that
`bench.py` reports for the driver:

  primary_rays_per_s_per_chip_teapot   (same as bench.py)
  backward_over_forward                <= 2.5 target: cost of
                                       value_and_grad of a pixel loss
                                       w.r.t. verts/colors/materials vs
                                       the forward render of the same rays
  whitted_frame_seconds                full 800x800x4spp reference frame
                                       (reflect 4, 10-ray diffuse, shadows)
  scaling_efficiency_n<N>              per-device rays/s at N devices vs
                                       at 1 device (ray batch sharded,
                                       geometry replicated). Needs a
                                       multi-device runtime to be
                                       meaningful; on one chip prints 1.0.

Usage: python bench_suite.py [--skip-frame]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.models.camera import block_ray_ids, camera_rays_for_ids
from raytracing_tpu.models.whitted import render, render_rays


def _emit(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": value, "unit": unit}
    if baseline is not None:
        rec["vs_baseline"] = value / baseline
    print(json.dumps(rec), flush=True)


def bench_backward_over_forward(scene, accel, cfg):
    """Forward render vs value_and_grad of a scalar pixel loss w.r.t.
    verts + colors + materials, on identical ray batches."""
    # Representative mid-frame batch (16 chunks over the teapot region):
    # a sky-only batch makes forward artificially cheap (dead tiles cull
    # free) and the ratio meaninglessly large.
    ids = jnp.concatenate(
        [block_ray_ids(i, 16384, cfg, 16, 16) for i in range(90, 106)]
    )
    o, d = camera_rays_for_ids(ids, cfg)
    key = jax.random.PRNGKey(3)

    def loss_of(verts, colors, materials):
        mesh = scene.mesh._replace(verts=verts, colors=colors,
                                   materials=materials)
        rgb = render_rays(mesh, accel, scene.sun, o, d, key, cfg)
        return jnp.sum(rgb * rgb)

    fwd = jax.jit(loss_of)
    bwd = jax.jit(jax.value_and_grad(loss_of, argnums=(0, 1, 2)))
    args = (scene.mesh.verts, scene.mesh.colors, scene.mesh.materials)
    jax.block_until_ready(fwd(*args))
    jax.block_until_ready(bwd(*args))

    def timeit(f, iters=8):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    tf = timeit(fwd)
    tb = timeit(bwd)
    return tb / tf, tf, tb


def bench_scaling(scene, cfg):
    """Per-device throughput at 1 vs N devices (render_sharded)."""
    from raytracing_tpu.parallel.shard import make_device_mesh, render_sharded

    results = {}
    n_all = len(jax.devices())
    for n in sorted({1, n_all}):
        dmesh = make_device_mesh(n)
        sc = cfg.replace(width=256, height=256, samples_per_pixel=4,
                         backend="cluster", diffuse_depth=0, reflect_depth=1)
        img = jax.block_until_ready(render_sharded(scene, sc, dmesh))
        t0 = time.perf_counter()
        for _ in range(3):
            img = render_sharded(scene, sc, dmesh)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / 3
        rays = 256 * 256 * 4
        results[n] = rays / dt / n  # per-device rays/s
    return results, n_all


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-frame", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    scene = build_default_scene(t=0.0)
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4,
                       backend="pallas" if on_tpu else "cluster")
    accel = build_cluster_accel(scene.mesh, cluster_size=16)

    # 1. headline primary rays/s (delegate to bench.py's logic)
    import bench
    bench.main()

    # 2. backward/forward ratio
    ratio, tf, tb = bench_backward_over_forward(scene, accel, cfg)
    _emit("backward_over_forward", ratio, "x", baseline=2.5)
    _emit("forward_262k_rays", tf * 1e3, "ms")
    _emit("backward_262k_rays", tb * 1e3, "ms")

    # 3. full reference frame
    if not args.skip_frame:
        img = jax.block_until_ready(render(scene, cfg, accel=accel))
        t0 = time.perf_counter()
        img = jax.block_until_ready(
            render(scene, cfg, accel=accel, key=jax.random.PRNGKey(1)))
        dt = time.perf_counter() - t0
        _emit("whitted_frame_seconds", dt, "s")
        _emit("whitted_fps", 1.0 / dt, "fps")

    # 4. accel build time — the analog of the reference's criterion
    # pack_triangles microbenchmark (benches/simd_bench.rs:62-64), now
    # covering the whole structure build (sort + pack + kernel blocks).
    t0 = time.perf_counter()
    build_cluster_accel(scene.mesh, cluster_size=16)
    _emit("accel_build_teapot_scene", (time.perf_counter() - t0) * 1e3,
          "ms")

    # 5. scaling efficiency across available devices
    results, n_all = bench_scaling(scene, cfg)
    if n_all > 1:
        _emit(f"scaling_efficiency_n{n_all}",
              results[n_all] / results[1], "x", baseline=0.85)
    else:
        _emit("scaling_efficiency_n1", 1.0, "x")


if __name__ == "__main__":
    main()
