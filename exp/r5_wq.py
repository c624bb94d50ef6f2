"""Round-5 work-queue walk sweep: time the busy chunk's level-2 bounce
trace (the frame's dominant cost, exp/NOTES_r4_gi.md) with the dynamic
kernel (round-4 defaults: lane_cull + early_exit) vs the wq kernel, over
gi cluster size and WQ_U. Also times the level-2 SHADOW (any-hit) query.

Run on the chip from the repo root: python exp/r5_wq.py [chunk]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
import raytracing_tpu.kernels.traverse as trav


def timed(fn, key0, n=5, trials=3):
    r0 = jax.block_until_ready(fn(key0))
    best = float("inf")
    for trial in range(trials):
        t0 = time.perf_counter()
        for it in range(n):
            jax.block_until_ready(fn(jax.random.fold_in(key0, trial * n + it)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best, r0


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

    # Sorted level-2 batch (the frame's actual walk input)
    @jax.jit
    def sort2(key):
        lo_, hi_ = batch_bounds(o2, a2)
        k = bounce_bin_key(o2, d2, lo_, hi_, a2)
        _, (o2s, d2s, a2s) = bin_sort(k, o2, d2, a2)
        return o2s, d2s, a2s

    o2s, d2s, a2s = jax.block_until_ready(sort2(key0))

    for cs in (32, 64, 128):
        gi = build_cluster_accel(scene.mesh, cluster_size=cs,
                                 variants=("pmt",))

        # baseline: round-4 defaults (lane_cull kernel mode, early exit)
        @jax.jit
        def l2_base(key):
            h2, _ = nearest_hit_shaded(
                mesh, gi, o2s + 0.0 * key[0], d2s, cfg, alive=a2s,
                early_exit=True, lane_cull=True)
            return jnp.sum(jnp.where(jnp.isfinite(h2.t), h2.t, 0.0))

        tb, rb = timed(l2_base, key0)
        print(f"cs={cs} dyn(lane_cull+ee): {tb*1e3:7.2f} ms "
              f"({o2.shape[0]/tb/1e6:6.1f} Mrays/s)  sum={float(rb):.1f}")

        for impl, ee in (("dma", None), ("dma", False), ("grid", None)):
            if impl == "dma" and cs % 128:
                continue  # dma walk requires lane-aligned cluster size
            trav._WQ_IMPL = impl

            @jax.jit
            def l2_wq(key, _i=impl, _e=ee):
                h2, _ = nearest_hit_shaded(
                    mesh, gi, o2s + 0.0 * key[0], d2s, cfg, alive=a2s,
                    wq=True, early_exit=_e)
                return jnp.sum(jnp.where(jnp.isfinite(h2.t), h2.t, 0.0))

            try:
                tw, rw = timed(l2_wq, key0)
            except Exception as e:
                print(f"cs={cs} wq {impl} ee={ee}: FAIL "
                      f"{type(e).__name__}: {str(e)[:200]}")
                continue
            ok = "OK" if abs(float(rw) - float(rb)) < 1e-3 * abs(float(rb)) \
                else f"MISMATCH {float(rw):.1f} vs {float(rb):.1f}"
            print(f"cs={cs} wq {impl} ee={ee}: {tw*1e3:7.2f} ms "
                  f"({o2.shape[0]/tw/1e6:6.1f} Mrays/s)  {ok}")
        trav._WQ_IMPL = "dma"

    # shadow (any-hit) at the level-2 hit points, gi cs=128
    gi = build_cluster_accel(scene.mesh, cluster_size=128,
                             variants=("pmt",))
    h2, at2 = jax.jit(lambda: nearest_hit_shaded(
        mesh, gi, o2s, d2s, cfg, alive=a2s, early_exit=True,
        lane_cull=True))()
    sh2 = jax.jit(lambda: shade(mesh, gi, sun, o2s, d2s, h2, cfg,
                                attrs=at2, bin_shadow=False))()
    from raytracing_tpu.ops.linalg import normalize
    pos2 = sh2.pos
    dir2 = normalize(sun - pos2, eps=1e-20)
    al2 = h2.hit & (jnp.sum(sh2.n * dir2, -1) > 0)
    from raytracing_tpu.tracer import any_hit

    @jax.jit
    def sh_base(key):
        occ = any_hit(mesh, gi, pos2 + 0.0 * key[0], dir2, cfg, alive=al2,
                      lane_cull=True)
        # Mask DEAD lanes: their o/d are garbage and both paths produce
        # meaningless (different) results there by contract.
        return jnp.sum((occ & al2).astype(jnp.int32))

    tb, rb = timed(sh_base, key0)
    print(f"shadow dyn(lane_cull): {tb*1e3:7.2f} ms  occ={int(rb)}")

    from raytracing_tpu.kernels.traverse import any_hit_pallas

    @jax.jit
    def sh_wq(key):
        occ = any_hit_pallas(mesh, gi, pos2 + 0.0 * key[0], dir2, cfg.eps,
                             alive=al2, wq=True)
        return jnp.sum((occ & al2).astype(jnp.int32))

    tw, rw = timed(sh_wq, key0)
    ok = "OK" if int(rw) == int(rb) else f"MISMATCH {int(rw)} vs {int(rb)}"
    print(f"shadow wq dma:         {tw*1e3:7.2f} ms  {ok}")


if __name__ == "__main__":
    main()
