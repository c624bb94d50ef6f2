"""Round-3: camera-mode large-scene throughput (404k default).

Run: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_large_cam.py [levels]
"""
import sys
import time

import jax
import jax.numpy as jnp

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.geometry.scene import subdivided_teapot_mesh
from raytracing_tpu.kernels import traverse as tv
from raytracing_tpu.ops.sampling import stratified_offsets

W = H = 800
SPP = 4


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mesh = subdivided_teapot_mesh(levels=levels)
    n = W * H * SPP
    print(f"{mesh.tri_v.shape[0]} tris", flush=True)
    offs0 = stratified_offsets(SPP)

    @jax.jit
    def null(state, offs):
        return (jnp.sum(offs + state * 1e-12) * 1e-20,)

    def chain(f, iters=5):
        s = jax.block_until_ready(f(jnp.float32(0.0), offs0))[0]
        best = float("inf")
        for _ in range(2):
            st = s
            t0 = time.perf_counter()
            for _ in range(iters):
                st = f(st, offs0)[0]
            jax.block_until_ready(st)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    dt_null = chain(null)
    print(f"null {dt_null*1e3:.2f} ms", flush=True)

    for cs in ((64, 128) if levels <= 3 else (128,)):
        try:
            accel = build_cluster_accel(mesh, cluster_size=cs,
                                        variants=("pmt",))
            jax.block_until_ready(accel.cluster_min)
            for bh in (16, 8):
                @jax.jit
                def step(state, offs, bh=bh):
                    of = offs + state * 1e-12
                    t, _ = tv.nearest_hit_camera_soa(accel, of, width=W,
                                                     height=H, spp=SPP,
                                                     bh=bh, bw=bh)
                    hit = jnp.isfinite(t)
                    return (jnp.sum(t, where=hit) * 1e-20 +
                            jnp.sum(hit).astype(jnp.float32) * 0.0,)

                dt = chain(step)
                print(f"cs={cs} bh={bh} camera: {(dt-dt_null)*1e3:.2f} ms"
                      f" -> {n/max(dt-dt_null,1e-9)/1e6:.1f} Mrays/s",
                      flush=True)
            del accel
        except Exception as e:
            print(f"cs={cs}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
