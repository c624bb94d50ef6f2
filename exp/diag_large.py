"""Diagnose large-scene (404k / 1.6M tri) traversal cost.

Reports, per scene and cluster size: cluster count, supercell mode,
visit-list width, mean/max visit count, overflow fraction, tests/ray,
and chained nearest-hit throughput. Run on the real chip:
    python exp/diag_large.py [levels ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import subdivided_teapot_mesh
from raytracing_tpu.kernels import traverse as tv
from raytracing_tpu.models.camera import block_permutation, camera_rays


def ray_pack():
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4)
    o, d = camera_rays(cfg)
    spp, h, w = o.shape[:3]
    perm, _ = block_permutation(spp, h, w, 16, 16)
    on = np.asarray(o).reshape(-1, 3)[np.asarray(perm)]
    dn = np.asarray(d).reshape(-1, 3)[np.asarray(perm)]
    n = on.shape[0]
    return jnp.asarray(np.concatenate(
        [on.T, np.ones((1, n), np.float32), dn.T,
         np.ones((1, n), np.float32)], axis=0)), n


from raytracing_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    on_tpu = jax.default_backend() == "tpu"
    rays8, n = ray_pack()
    levels = [int(a) for a in sys.argv[1:]] or [3]
    for lv in levels:
        t0 = time.perf_counter()
        mesh = subdivided_teapot_mesh(levels=lv)
        print(f"levels={lv}: {mesh.tri_v.shape[0]} tris "
              f"(mesh {time.perf_counter()-t0:.1f}s)", flush=True)
        for cs in (64, 128):
            t0 = time.perf_counter()
            accel = build_cluster_accel(mesh, cluster_size=cs,
                                        variants=("pmt",))
            jax.block_until_ready(accel.cluster_min)
            b = time.perf_counter() - t0
            c = accel.num_clusters
            rp, _ = tv._pad_rays_soa(rays8)
            ids, tnear, cnt = tv._tile_visit_lists_soa(
                rp, accel.cluster_min, accel.cluster_max, tv.RAY_TILE,
                interpret=not on_tpu)
            cnt_np = np.asarray(cnt)
            w = ids.shape[1]
            ovf = float((cnt_np > w).mean())
            # actual tests per ray: overflow tiles scan ALL c clusters
            eff = np.where(cnt_np > w, c, cnt_np)
            print(f"  cs={cs}: C={c} build={b:.1f}s width={w} "
                  f"cnt mean={cnt_np.mean():.0f} max={cnt_np.max()} "
                  f"ovf={ovf:.3%} tests/ray={eff.mean()*cs:.0f}", flush=True)

            @jax.jit
            def step(c_, r8):
                r = r8.at[0, 0].add(c_ * 1e-12)
                t, _ = tv.nearest_hit_soa(accel, r, interpret=not on_tpu)
                hit = jnp.isfinite(t)
                return jnp.sum(t, where=hit) * 1e-20, jnp.sum(hit)

            s, hits = jax.block_until_ready(step(jnp.float32(0.0), rays8))
            iters = 5 if on_tpu else 1
            best = float("inf")
            for _ in range(2):
                st = s
                t0 = time.perf_counter()
                for _ in range(iters):
                    st, _ = step(st, rays8)
                jax.block_until_ready(st)
                best = min(best, (time.perf_counter() - t0) / iters)
            print(f"    hit={float(hits)/n:.3f} {best*1e3:.1f} ms "
                  f"-> {n/best/1e6:.1f} Mrays/s", flush=True)
            del accel


if __name__ == "__main__":
    main()
