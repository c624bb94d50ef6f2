"""Round-5 sweep 2: GI-level trace with the DMA walk over the knobs the
old per-visit fixed cost locked out — smaller culling tiles (fewer
entered clusters per tile => fewer triangle tests per ray) and finer
bounce-bin direction cones (tighter tile direction intervals).

Run: timeout ... python - [chunk] < exp/r5_gi2.py
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
    batch_bounds, bin_sort, fine_direction_bin, morton3)
from raytracing_tpu.models.camera import block_ray_ids, camera_rays_for_ids
from raytracing_tpu.models.whitted import shade
from raytracing_tpu.ops.sampling import cosine_hemisphere
from raytracing_tpu.ops.intersect import reflect
from raytracing_tpu.tracer import nearest_hit_shaded


def timed(fn, key0, n=5, trials=3):
    r0 = jax.block_until_ready(fn(key0))
    best = float("inf")
    for trial in range(trials):
        t0 = time.perf_counter()
        for it in range(n):
            jax.block_until_ready(fn(jax.random.fold_in(key0,
                                                        trial * n + it)))
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
        kd = jax.random.fold_in(key, 1)
        wdirs = cosine_hemisphere(kd, sh.n, shape=(s,))
        po = jnp.concatenate(
            [sh.pos, jnp.broadcast_to(sh.pos[None],
                                      (s, n_l, 3)).reshape(s * n_l, 3)], 0)
        pd = jnp.concatenate([reflect(d, sh.n), wdirs.reshape(s * n_l, 3)],
                             0)
        pa = jnp.concatenate(
            [h.hit & (sh.refl > 0.0),
             jnp.broadcast_to((h.hit & (sh.rough > 0.0))[None],
                              (s, n_l)).reshape(s * n_l)], 0)
        return po, pd, pa

    key0 = jax.random.PRNGKey(0)
    o2, d2, a2 = jax.block_until_ready(jax.jit(spawn)(key0))
    print(f"level-2 rays: {o2.shape[0]}", flush=True)

    gi = build_cluster_accel(scene.mesh, cluster_size=128,
                             variants=("pmt",))

    for rbits in (2, 3, 4):
        @jax.jit
        def sortit(_r=rbits):
            lo_, hi_ = batch_bounds(o2, a2)
            db = fine_direction_bin(d2, _r)
            k = (db << 9) | morton3(o2, lo_, hi_, bits=3)
            k = jnp.where(a2, k, jnp.int32(1) << 30)
            _, (os_, ds_, as_) = bin_sort(k, o2, d2, a2)
            return os_, ds_, as_

        o2s, d2s, a2s = jax.block_until_ready(sortit())
        for rt in (1024, 512, 256):
            for wq in (True, False):
                @jax.jit
                def l2(key, _rt=rt, _wq=wq):
                    h2, _ = nearest_hit_shaded(
                        mesh, gi, o2s + 0.0 * key[0], d2s, cfg, alive=a2s,
                        wq=_wq, early_exit=True, ray_tile=_rt,
                        lane_cull=not _wq)
                    return jnp.sum(jnp.where(jnp.isfinite(h2.t), h2.t,
                                             0.0))

                try:
                    tw, rw = timed(l2, key0)
                except Exception as e:
                    print(f"rbits={rbits} rt={rt} wq={wq}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                print(f"rbits={rbits} rt={rt:4d} "
                      f"{'dma' if wq else 'dyn'}: {tw*1e3:7.2f} ms "
                      f"({o2.shape[0]/tw/1e6:5.1f} Mrays/s) "
                      f"sum={float(rw):.0f}", flush=True)


if __name__ == "__main__":
    main()
