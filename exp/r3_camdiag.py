"""Camera-mode visit stats at 404k/1.6M tris: exact per-tile cnt, pooled
supertile cnt vs wp (overflow => full scan), and throughput."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from raytracing_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.geometry.scene import subdivided_teapot_mesh
from raytracing_tpu.kernels import traverse as tv
from raytracing_tpu.ops.sampling import stratified_offsets

w = h = 800; spp = 4; bh = bw = 16
offs = jnp.asarray(np.asarray(stratified_offsets(spp)))
aspect = 1.0
for lv, cs in ((3, 64), (4, 128)):
    mesh = subdivided_teapot_mesh(levels=lv)
    accel = build_cluster_accel(mesh, cluster_size=cs, variants=("pmt",))
    C = accel.num_clusters
    n_tiles = (w // bw) * (h // bh)
    o_lo, o_hi, d_lo, d_hi = tv._camera_tile_extents(
        n_tiles, offs, w, h, spp, 1.0, aspect, bh, bw)
    # exact per-tile lists
    ids, tnear, cnt = tv._visit_lists_from_extents(
        o_lo, o_hi, d_lo, d_hi, accel.cluster_min, accel.cluster_max)
    cnt = np.asarray(cnt); wd = ids.shape[1]
    print(f"lv={lv} C={C} cs={cs} exact: width={wd} cnt mean={cnt.mean():.0f} "
          f"p95={np.percentile(cnt,95):.0f} max={cnt.max()} "
          f"ovf={(cnt>wd).mean():.3%} tests/ray={np.where(cnt>wd,C,cnt).mean()*cs:.0f}",
          flush=True)
    # pooled supertile lists (what camera mode actually uses)
    g = tv._supertile_group(C)
    if g > 1:
        nby, nbx = h // bh, w // bw
        px = (w // 2 // bw) % 2; py = (h // 2 // bh) % 2
        nby2 = (py + nby + 1) // 2; nbx2 = (px + nbx + 1) // 2
        big = jnp.float32(3e38)
        def pool2d(a, inverted):
            fill = -big if inverted else big
            a = a.reshape(nby, nbx, 3)
            a = jnp.pad(a, ((py, 2*nby2-nby-py), (px, 2*nbx2-nbx-px), (0,0)),
                        constant_values=fill)
            a = a.reshape(nby2, 2, nbx2, 2, 3)
            return (a.max((1,3)) if inverted else a.min((1,3))).reshape(nby2*nbx2, 3)
        ids_p, tn_p, cnt_p = tv._visit_lists_from_extents(
            pool2d(o_lo,False), pool2d(o_hi,True),
            pool2d(d_lo,False), pool2d(d_hi,True),
            accel.cluster_min, accel.cluster_max)
        cp = np.asarray(cnt_p); wp = ids_p.shape[1]
        print(f"  pooled: nst={cp.shape[0]} wp={wp} cnt mean={cp.mean():.0f} "
              f"p95={np.percentile(cp,95):.0f} max={cp.max()} "
              f"OVF={(cp>wp).mean():.3%}  (ovf tile => {C}-cluster full scan)",
              flush=True)
    del accel, mesh
