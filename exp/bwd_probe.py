"""Backward-ratio ablation on the real chip.

Measures backward/forward for the bench_suite loss three ways:
  A. current code (custom sort-VJP binning + grad-planes walk)
  B. binning VJP ablated: bin_sort/unsort replaced by native lax.sort
     autodiff (gather-transpose scatters) — isolates the _sort_cols win
  C. binning disabled entirely (bin_secondary=bin_shadow=False)

Run: python exp/bwd_probe.py
"""
import jax
import jax.numpy as jnp

from raytracing_tpu.utils.cache import enable_persistent_cache


def native_bin_sort(key, *payloads):
    flat, specs = [], []
    for p in payloads:
        if p.ndim == 1:
            flat.append(p)
            specs.append(None)
        else:
            flat.extend(p[:, j] for j in range(p.shape[1]))
            specs.append(p.shape[1])
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort((key, iota) + tuple(flat), num_keys=1)
    sidx = out[1]
    rebuilt, k = [], 2
    for p, spec in zip(payloads, specs):
        if spec is None:
            rebuilt.append(out[k])
            k += 1
        else:
            rebuilt.append(jnp.stack(out[k:k + spec], axis=1))
            k += spec
    return sidx, tuple(rebuilt)


def native_unsort(sidx, *payloads):
    _, rebuilt = native_bin_sort(sidx, *payloads)
    return rebuilt


def main():
    enable_persistent_cache()
    import bench_suite as bs
    from raytracing_tpu.accel.packets import build_cluster_accel
    from raytracing_tpu.config import RenderConfig
    from raytracing_tpu.geometry.scene import build_default_scene
    from raytracing_tpu.models import whitted

    on_tpu = jax.default_backend() == "tpu"
    scene = build_default_scene(t=0.0)
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4,
                       backend="pallas" if on_tpu else "cluster")
    accel = build_cluster_accel(scene.mesh, cluster_size=16)

    ratio, tf, tb = bs.bench_backward_over_forward(scene, accel, cfg)
    print(f"A current:      fwd {tf*1e3:7.1f} ms  bwd {tb*1e3:7.1f} ms  "
          f"ratio {ratio:.2f}", flush=True)

    orig = (whitted.bin_sort, whitted.unsort)
    whitted.bin_sort, whitted.unsort = native_bin_sort, native_unsort
    try:
        ratio, tf, tb = bs.bench_backward_over_forward(scene, accel, cfg)
        print(f"B native sorts: fwd {tf*1e3:7.1f} ms  bwd {tb*1e3:7.1f} ms  "
              f"ratio {ratio:.2f}", flush=True)
    finally:
        whitted.bin_sort, whitted.unsort = orig

    cfg_nb = cfg.replace(bin_secondary=False, bin_shadow=False)
    ratio, tf, tb = bs.bench_backward_over_forward(scene, accel, cfg_nb)
    print(f"C no binning:   fwd {tf*1e3:7.1f} ms  bwd {tb*1e3:7.1f} ms  "
          f"ratio {ratio:.2f}", flush=True)


if __name__ == "__main__":
    main()
