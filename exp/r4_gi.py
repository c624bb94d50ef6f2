"""Round-4 GI-level sweep: time the busy chunk's level-2 bounce trace
(the measured 85 ms / 153 ms of chunk 20 — exp/r4_chunkmap.py +
frame_breakdown) under the candidate knobs:

  gi_ray_tile   in {1024, 512, 256, 128}   (culling-tile rays)
  gi cluster sz in {32, 64, 128}           (walk partition)
  t_cap         off / 0.05 x diagonal      (two-phase capped query)

Run on the chip from the repo root: python - [chunk] < exp/r4_gi.py
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
from raytracing_tpu.kernels.binning import (
    batch_bounds, bin_sort, bounce_bin_key)
from raytracing_tpu.models.camera import block_ray_ids, camera_rays_for_ids
from raytracing_tpu.models.whitted import shade
from raytracing_tpu.ops.sampling import cosine_hemisphere
from raytracing_tpu.ops.intersect import reflect
from raytracing_tpu.tracer import nearest_hit_shaded


def main():
    ci = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4,
                       backend="pallas", bin_shadow=False)
    mesh, sun = scene.mesh, scene.sun
    chunk = cfg.chunk_size
    s = cfg.diffuse_scatter
    ids = block_ray_ids(ci, chunk, cfg, 16, 16)
    o, d = camera_rays_for_ids(ids, cfg)

    def spawn(key):
        h, attrs = nearest_hit_shaded(mesh, accel, o, d, cfg)
        sh = shade(mesh, accel, sun, o, d, h, cfg, attrs=attrs,
                   bin_shadow=False)
        n_l = o.shape[0]
        parts_o = [sh.pos]
        parts_d = [reflect(d, sh.n)]
        parts_a = [h.hit & (sh.refl > 0.0)]
        kd = jax.random.fold_in(key, 1)
        wdirs = cosine_hemisphere(kd, sh.n, shape=(s,))
        parts_o.append(jnp.broadcast_to(
            sh.pos[None], (s, n_l, 3)).reshape(s * n_l, 3))
        parts_d.append(wdirs.reshape(s * n_l, 3))
        parts_a.append(jnp.broadcast_to(
            (h.hit & (sh.rough > 0.0))[None], (s, n_l)).reshape(s * n_l))
        return (jnp.concatenate(parts_o, 0), jnp.concatenate(parts_d, 0),
                jnp.concatenate(parts_a, 0))

    key0 = jax.random.PRNGKey(0)
    o2, d2, a2 = jax.block_until_ready(jax.jit(spawn)(key0))
    print(f"level-2 rays: {o2.shape[0]}, alive: "
          f"{float(a2.sum()) / a2.shape[0]:.2f}")

    import numpy as np

    for cs in (32, 64, 128):
        gi = build_cluster_accel(scene.mesh, cluster_size=cs,
                                 variants=("pmt",))
        for rt in (1024, 512, 256, 128):
            for cap in (None, 0.05):
                t_cap = None
                if cap is not None:
                    lo_c = np.asarray(gi.cluster_min).min(axis=0)
                    hi_c = np.asarray(gi.cluster_max).max(axis=0)
                    t_cap = cap * float(np.linalg.norm(hi_c - lo_c))

                @jax.jit
                def l2(key):
                    lo_, hi_ = batch_bounds(o2, a2)
                    k = bounce_bin_key(o2, d2, lo_, hi_, a2)
                    _, (o2s, d2s, a2s) = bin_sort(k, o2, d2, a2)
                    h2, _ = nearest_hit_shaded(
                        mesh, gi, o2s, d2s, cfg, alive=a2s,
                        early_exit=True, t_cap=t_cap, ray_tile=rt)
                    return jnp.sum(jnp.where(jnp.isfinite(h2.t), h2.t, 0.0))

                try:
                    r0 = jax.block_until_ready(l2(key0))
                except Exception as e:
                    print(f"cs={cs} rt={rt} cap={cap}: FAIL "
                          f"{type(e).__name__}")
                    continue
                best = float("inf")
                for trial in range(3):
                    t0 = time.perf_counter()
                    for it in range(5):
                        jax.block_until_ready(
                            l2(jax.random.fold_in(key0, trial * 5 + it)))
                    best = min(best, (time.perf_counter() - t0) / 5)
                print(f"cs={cs} rt={rt} cap={cap}: {best * 1e3:.2f} ms "
                      f"({o2.shape[0] / best / 1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
