"""Phase split at 404k/1.6M: time the pooled+refined visit-list build
(phase 1+2, XLA) alone vs the full camera walk."""
import time
import jax, jax.numpy as jnp, numpy as np
from raytracing_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.geometry.scene import subdivided_teapot_mesh
from raytracing_tpu.kernels import traverse as tv
from raytracing_tpu.ops.sampling import stratified_offsets

w = h = 800; spp = 4; n = w*h*spp
offs0 = jnp.asarray(np.asarray(stratified_offsets(spp)))

def chain(fn, iters=8):
    s = jax.block_until_ready(fn(jnp.float32(0.0)))
    best = float("inf")
    for _ in range(3):
        st = s
        t0 = time.perf_counter()
        for _ in range(iters):
            st = fn(st)
        jax.block_until_ready(st)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

for lv, cs in ((3, 64), (4, 128)):
    mesh = subdivided_teapot_mesh(levels=lv)
    accel = build_cluster_accel(mesh, cluster_size=cs, variants=("pmt",))
    n_tiles = (w // 16) * (h // 16)

    @jax.jit
    def p1(c):
        of = offs0 + c * 1e-12
        o_lo, o_hi, d_lo, d_hi = tv._camera_tile_extents(
            n_tiles, of, w, h, spp, 1.0, 1.0, 16, 16)
        ids, tnear, cnt = tv._visit_lists_from_extents(
            o_lo, o_hi, d_lo, d_hi, accel.cluster_min, accel.cluster_max)
        return jnp.sum(cnt).astype(jnp.float32) * 1e-12 + c * 0

    @jax.jit
    def full(c):
        of = offs0 + c * 1e-12
        t, _ = tv.nearest_hit_camera_soa(accel, of, width=w, height=h,
                                         spp=spp, interpret=False)
        return jnp.sum(t, where=jnp.isfinite(t)) * 1e-20

    tp = chain(p1); tf = chain(full)
    print(f"lv={lv} C={accel.num_clusters}: exact-P1 {tp*1e3:.2f} ms  "
          f"full {tf*1e3:.2f} ms  -> {n/tf/1e6:.1f} Mrays/s", flush=True)
    del accel, mesh
