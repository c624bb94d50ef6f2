"""Round-4 large-scene sweep: camera-mode ray-tile size x cluster size.

Hypothesis (from exp/NOTES_r3_large.md): at 1.6M triangles the walk is
footprint-bound — a 16x16-pixel tile covers ~10-12 cs=128 clusters of
heavily oversampled geometry, and the per-tile visit lists are already
near-exact, so the remaining lever is the TILE AREA itself. bh=bw=8
quarters the footprint (and the round-4 phase-alignment fix makes its
gy=gx=4 supertile pooling actually align with the direction zero
crossing). Run on the chip: python - [levels] < exp/r4_large.py
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
from raytracing_tpu.kernels.traverse import nearest_hit_camera_soa
from raytracing_tpu.ops.sampling import stratified_offsets


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    w, h, spp = 800, 800, 4
    n = w * h * spp
    offs0 = jnp.asarray(np.asarray(stratified_offsets(spp)))
    mesh = subdivided_teapot_mesh(levels=levels)
    print(f"tris: {mesh.tri_v.shape[0]}")
    for cs in ((64, 128) if levels <= 3 else (128,)):
        t0 = time.perf_counter()
        accel = build_cluster_accel(mesh, cluster_size=cs,
                                    variants=("pmt",))
        jax.block_until_ready(accel.cluster_min)
        print(f"cs={cs} build {time.perf_counter() - t0:.1f}s "
              f"C={accel.num_clusters}")
        for bh, bw in ((16, 16), (8, 16), (8, 8), (4, 8)):
            @jax.jit
            def step(c, offs):
                of = offs + c * 1e-12
                t, _ = nearest_hit_camera_soa(
                    accel, of, width=w, height=h, spp=spp,
                    bh=bh, bw=bw)
                hit = jnp.isfinite(t)
                return jnp.sum(t, where=hit) * 1e-20, jnp.sum(hit)

            try:
                s, hits = jax.block_until_ready(
                    step(jnp.float32(0.0), offs0))
            except Exception as e:
                print(f"  bh={bh} bw={bw}: FAILED {type(e).__name__}")
                continue
            best = float("inf")
            for _ in range(3):
                st = s
                t0 = time.perf_counter()
                for _ in range(8):
                    st, _ = step(st, offs0)
                jax.block_until_ready(st)
                best = min(best, (time.perf_counter() - t0) / 8)
            print(f"  bh={bh} bw={bw}: {n / best / 1e6:.1f} Mrays/s "
                  f"({best * 1e3:.2f} ms, hit {float(hits) / n:.2f})")


if __name__ == "__main__":
    main()
