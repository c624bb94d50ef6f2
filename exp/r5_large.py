"""Round-5 large-scene sweep: 404k/1.6M-triangle camera-mode throughput
with the resident walk vs the DMA-prefetch fetch (_CAMERA_FETCH), and a
cluster-size look now that VMEM residency no longer caps it.

Run from repo root: timeout ... python - < exp/r5_large.py [levels]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.geometry.scene import subdivided_teapot_mesh
import raytracing_tpu.kernels.traverse as T
from raytracing_tpu.ops.sampling import stratified_offsets


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    w, h, spp = 800, 800, 4
    n = w * h * spp
    offs0 = jnp.asarray(np.asarray(stratified_offsets(spp)))
    t0 = time.perf_counter()
    mesh = subdivided_teapot_mesh(levels=levels)
    print(f"mesh: {mesh.num_triangles} tris "
          f"({time.perf_counter() - t0:.1f} s)", flush=True)

    for cs in (128, 256):
        t0 = time.perf_counter()
        accel = build_cluster_accel(mesh, cluster_size=cs,
                                    variants=("pmt",))
        jax.block_until_ready(accel.cluster_min)
        print(f"cs={cs}: build {time.perf_counter() - t0:.1f} s, "
              f"{accel.num_clusters} clusters", flush=True)
        for fetch in ("resident", "dma"):
            T._CAMERA_FETCH = fetch
            try:
                @jax.jit
                def step(c, offs, _f=fetch, _a=accel):
                    of = offs + c * 1e-12
                    t, _ = T.nearest_hit_camera_soa(
                        _a, of, width=w, height=h, spp=spp)
                    hit = jnp.isfinite(t)
                    return jnp.sum(t, where=hit) * 1e-20, jnp.sum(hit)

                s, hits = jax.block_until_ready(
                    step(jnp.float32(0.0), offs0))
            except Exception as e:
                print(f"cs={cs} {fetch}: FAIL {type(e).__name__}: "
                      f"{str(e)[:150]}", flush=True)
                continue
            best = float("inf")
            for _ in range(3):
                st = s
                t0 = time.perf_counter()
                for _ in range(10):
                    st, _ = step(st, offs0)
                jax.block_until_ready(st)
                best = min(best, (time.perf_counter() - t0) / 10)
            print(f"cs={cs} {fetch}: {n / best / 1e6:7.1f} Mrays/s "
                  f"({best * 1e3:.2f} ms, hits {int(hits)})", flush=True)
        T._CAMERA_FETCH = "auto"
        del accel


if __name__ == "__main__":
    main()
