"""Decompose one Whitted chunk program's cost level by level.

Times progressively larger prefixes of the render_rays pipeline on one
16Ki-ray chunk (the render() unit of dispatch):

    l1_trace       nearest_hit_shaded on the primaries
    l1_shade       + sun shadow (shade())
    l2_spawn_trace + child spawn, bin, trace at level 2
    l2_shade       + level-2 sun shadow
    full           complete render_rays (all levels + backward sweep)

Each step is chained on the RNG key so no call can be deduped. Run on
the chip: python exp/frame_breakdown.py
"""
import time

import jax
import jax.numpy as jnp

from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.scene import build_default_scene
from raytracing_tpu.kernels.binning import (
    bin_sort, bounce_bin_key, batch_bounds)
from raytracing_tpu.models.camera import block_ray_ids, camera_rays_for_ids
from raytracing_tpu.models.whitted import render_rays, shade
from raytracing_tpu.ops.intersect import reflect
from raytracing_tpu.ops.sampling import cosine_hemisphere
from raytracing_tpu.tracer import nearest_hit_shaded


def main():
    on_tpu = jax.default_backend() == "tpu"
    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    gi_accel = build_cluster_accel(scene.mesh, cluster_size=64,
                                   variants=("pmt",))
    cfg = RenderConfig(width=800, height=800, samples_per_pixel=4,
                       backend="pallas" if on_tpu else "cluster")
    mesh, sun = scene.mesh, scene.sun
    import sys
    ci = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    chunk = 65536
    ids = block_ray_ids(ci, chunk, cfg, 16, 16)
    o, d = camera_rays_for_ids(ids, cfg)
    s = cfg.diffuse_scatter

    def l1_trace(key):
        h, attrs = nearest_hit_shaded(
            mesh, accel, o, d, cfg,
            shared_origin=o[0] if cfg.primary_shared_origin else None)
        # Value-preserving key dependency (an x*0.0 term could be
        # folded away, letting the dispatch cache dedupe the stage).
        return h.t + jax.random.uniform(key, (), minval=0.0,
                                        maxval=1e-30), (h, attrs)

    def l1_shade(key):
        _, (h, attrs) = l1_trace(key)
        sh = shade(mesh, accel, sun, o, d, h, cfg, attrs=attrs)
        return sh.direct[:, 0], (h, sh)

    def spawn(key, h, sh, d_l):
        n_l = h.t.shape[0]
        parts_o = [sh.pos]
        parts_d = [reflect(d_l, sh.n)]
        parts_a = [h.hit & (sh.refl > 0.0)]
        kd = jax.random.fold_in(key, 1)
        wdirs = cosine_hemisphere(kd, sh.n, shape=(s,))
        parts_o.append(jnp.broadcast_to(
            sh.pos[None], (s, n_l, 3)).reshape(s * n_l, 3))
        parts_d.append(wdirs.reshape(s * n_l, 3))
        parts_a.append(jnp.broadcast_to(
            (h.hit & (sh.rough > 0.0))[None], (s, n_l)).reshape(s * n_l))
        return (jnp.concatenate(parts_o, 0), jnp.concatenate(parts_d, 0),
                jnp.concatenate(parts_a, 0))

    def l2_spawn_trace(key):
        _, (h, sh) = l1_shade(key)
        o2, d2, a2 = spawn(key, h, sh, d)
        # batch_bounds, not scene_bounds: production (whitted.render_rays)
        # quantizes bounce bin keys over the batch's own live origins.
        lo_, hi_ = batch_bounds(o2, a2)
        k = bounce_bin_key(o2, d2, lo_, hi_, a2)
        sidx, (o2s, d2s, a2s) = bin_sort(k, o2, d2, a2)
        h2, attrs2 = nearest_hit_shaded(mesh, gi_accel, o2s, d2s, cfg,
                                        alive=a2s, early_exit=True)
        return h2.t, (h, sh, h2, attrs2, o2s, d2s)

    def l2_shade(key):
        _, (h, sh, h2, attrs2, o2s, d2s) = l2_spawn_trace(key)
        sh2 = shade(mesh, gi_accel, sun, o2s, d2s, h2, cfg, attrs=attrs2)
        return sh2.direct[:, 0], (h2, sh2, o2s, d2s)

    def reflect_level(key, h_p, sh_p, o_p, d_p, tag):
        """One pure-reflect level (the L3/L4 shape): spawn reflect
        children of the parent, bin, trace, shade."""
        o_c = sh_p.pos
        d_c = reflect(d_p, sh_p.n)
        a_c = h_p.hit & (sh_p.refl > 0.0)
        lo_, hi_ = batch_bounds(o_c, a_c)
        k = bounce_bin_key(o_c, d_c, lo_, hi_, a_c)
        sidx, (o_s, d_s, a_s) = bin_sort(k, o_c, d_c, a_c)
        h_c, attrs_c = nearest_hit_shaded(mesh, gi_accel, o_s, d_s, cfg,
                                          alive=a_s, early_exit=True)
        sh_c = shade(mesh, gi_accel, sun, o_s, d_s, h_c, cfg, attrs=attrs_c)
        return h_c, sh_c, o_s, d_s

    def l3(key):
        _, (h2, sh2, o2s, d2s) = l2_shade(key)
        h3, sh3, o3, d3 = reflect_level(key, h2, sh2, o2s, d2s, "l3")
        return sh3.direct[:, 0], (h3, sh3, o3, d3)

    def l4(key):
        _, (h3, sh3, o3, d3) = l3(key)
        h4, sh4, o4, d4 = reflect_level(key, h3, sh3, o3, d3, "l4")
        return sh4.direct[:, 0], None

    def full(key):
        rgb = render_rays(mesh, accel, sun, o, d, key, cfg,
                          gi_accel=gi_accel)
        return rgb[:, 0], None

    def bench(name, fn, iters=10):
        jfn = jax.jit(lambda key: fn(key)[0])
        out = jax.block_until_ready(jfn(jax.random.PRNGKey(0)))
        best = float("inf")
        for _ in range(3):
            key = jax.random.PRNGKey(1)
            t0 = time.perf_counter()
            for _ in range(iters):
                key = jax.random.fold_in(key, 1)
                out = jfn(key)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name:16s} {best*1e3:8.3f} ms/chunk "
              f"(x40 = {best*40:6.2f} s/frame)", flush=True)
        return best

    bench("l1_trace", l1_trace)
    bench("l1_shade", l1_shade)
    bench("l2_spawn_trace", l2_spawn_trace)
    bench("l2_shade", l2_shade)
    bench("l3_reflect", l3)
    bench("l4_reflect", l4)
    bench("full", full)


if __name__ == "__main__":
    main()
