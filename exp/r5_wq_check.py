"""Round-5 wq correctness check (CPU interpret mode): wq nearest/any-hit
must match the dynamic-kernel path exactly on a mixed coherent/incoherent
ray batch over the default scene. Run: JAX_PLATFORMS=cpu python exp/r5_wq_check.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.kernels.traverse import (
    any_hit_soa, nearest_hit_attrs_soa, rays_to_soa)


def main():
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=128,
                                variants=("pmt",))
    rng = np.random.default_rng(0)
    n = 4096
    # Half camera-ish rays, half hemispherical bounce-ish rays from points
    # near the teapots, some dead lanes.
    o1 = np.zeros((n // 2, 3), np.float32)
    xs = rng.uniform(-0.4, 0.4, (n // 2, 2)).astype(np.float32)
    d1 = np.concatenate([xs, np.ones((n // 2, 1), np.float32)], axis=1)
    o2 = rng.uniform(-3, 3, (n // 2, 3)).astype(np.float32)
    o2[:, 1] = rng.uniform(-3, 1, n // 2)
    o2[:, 2] += 7.0
    d2 = rng.normal(size=(n // 2, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o = np.concatenate([o1, o2])
    d = np.concatenate([d1, d2])
    alive = rng.uniform(size=n) > 0.1
    rays8 = rays_to_soa(jnp.asarray(o), jnp.asarray(d),
                        alive=jnp.asarray(alive))

    import raytracing_tpu.kernels.traverse as trav

    t0, s0, a0 = nearest_hit_attrs_soa(accel, rays8, interpret=True)
    m = alive
    occ0 = any_hit_soa(accel, rays8, interpret=True)
    tmax = rng.uniform(0.5, 30.0, n).astype(np.float32)
    occ2 = any_hit_soa(accel, rays8, t_max=jnp.asarray(tmax),
                       interpret=True)

    for impl in ("dma", "grid"):
        trav._WQ_IMPL = impl
        t1, s1, a1 = nearest_hit_attrs_soa(accel, rays8, interpret=True,
                                           wq=True)
        assert np.array_equal(np.asarray(t0)[m], np.asarray(t1)[m]), (
            impl,
            np.abs(np.nan_to_num(np.asarray(t0) - np.asarray(t1)))[m].max())
        assert np.array_equal(np.asarray(s0)[m], np.asarray(s1)[m]), (
            impl, (np.asarray(s0) != np.asarray(s1))[m].sum())
        assert np.array_equal(np.asarray(a0)[:, m], np.asarray(a1)[:, m])
        print(f"[{impl}] nearest+attrs: wq == dynamic on",
              int(np.isfinite(np.asarray(t0)[m]).sum()), "hits /",
              int(m.sum()), "alive")

        occ1 = any_hit_soa(accel, rays8, interpret=True, wq=True)
        assert np.array_equal(np.asarray(occ0)[m], np.asarray(occ1)[m])
        occ3 = any_hit_soa(accel, rays8, t_max=jnp.asarray(tmax),
                           interpret=True, wq=True)
        assert np.array_equal(np.asarray(occ2)[m], np.asarray(occ3)[m])
        print(f"[{impl}] any-hit (+per-ray tmax): wq == dynamic,",
              int(np.asarray(occ0)[m].sum()), "occluded")

        # t_cap two-phase composition
        t2, s2, a2 = nearest_hit_attrs_soa(accel, rays8, interpret=True,
                                           t_cap=5.0, wq=True)
        assert np.array_equal(np.asarray(t0)[m], np.asarray(t2)[m])
        assert np.array_equal(np.asarray(s0)[m], np.asarray(s2)[m])
        print(f"[{impl}] t_cap two-phase: wq exact")
    trav._WQ_IMPL = "dma"


if __name__ == "__main__":
    main()
