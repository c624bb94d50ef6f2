"""Round-3: in-place-carry iterated headline measurement.

Carrying the ray pack through the fori_loop lets XLA alias the
dynamic-update-slice in place — the 82 MB copy that the closed-over-pack
formulation paid per iteration (2.37 ms, exp/r3_loopbench.py) vanishes,
leaving the traversal itself. The chain stays honest: every iteration's
pack differs (state folds the previous result into ray 0's direction).

Run: PYTHONPATH=/root/.axon_site:/root/repo python exp/r3_loopbench2.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.kernels import traverse as tv
from raytracing_tpu.models.camera import block_permutation, camera_rays

ITERS = 10


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


def main():
    scene = build_default_scene(t=0.0)
    rays8, n = ray_pack()
    o_shared = jnp.zeros(3, jnp.float32)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)

    @jax.jit
    def frames(state, r8):
        def body(i, st):
            s, r8_, hits = st
            r8_ = r8_.at[4, 0].add(s * 1e-12)
            t, _ = tv.nearest_hit_soa(accel, r8_, shared_origin=o_shared)
            hit = jnp.isfinite(t)
            return (jnp.sum(t, where=hit) * 1e-20, r8_,
                    hits + jnp.sum(hit))
        s, r8o, hits = jax.lax.fori_loop(
            0, ITERS, body, (state, r8, jnp.int32(0)))
        return s, r8o, hits

    @jax.jit
    def nulls(state, r8):
        def body(i, st):
            s, r8_ = st
            r8_ = r8_.at[4, 0].add(s * 1e-12)
            return (jnp.sum(r8_[4, :8]) * 1e-20, r8_)
        s, r8o = jax.lax.fori_loop(0, ITERS, body, (state, r8))
        return s, r8o, jnp.int32(0)

    def chain(f, reps=4):
        s, r8o, hits = jax.block_until_ready(f(jnp.float32(0.0), rays8))
        best = float("inf")
        for _ in range(reps):
            st = s
            t0 = time.perf_counter()
            st, r8o, _ = f(st, rays8)
            jax.block_until_ready(st)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best, hits

    dt_n, _ = chain(nulls)
    print(f"null/iter: {dt_n*1e3:.3f} ms", flush=True)
    dt, hits = chain(frames)
    hf = float(hits) / (ITERS * n)
    print(f"frame/iter: {dt*1e3:.3f} ms (hit frac {hf:.3f})", flush=True)
    print(f"net {(dt-dt_n)*1e3:.3f} ms -> "
          f"{n/max(dt-dt_n, 1e-9)/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
