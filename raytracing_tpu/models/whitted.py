"""Whitted + one-bounce-diffuse integrator — reference-parity renderer.

This is the TPU re-design of the reference's recursive `trace_ray`
(/root/reference/src/main.rs:88-311). The recursion (mirror reflection to
REFLECT_DEPTH=4, cosine-hemisphere diffuse fan-out of DIFFUSE_SCATT=10 rays
to DIFFUSE_DEPTH=2) becomes an *iterative wavefront over statically-shaped
ray levels*: level l holds every ray at recursion depth l as one flat batch,
children are appended as [reflect | diffuse] blocks with per-ray RGB weights,
and radiance is accumulated bottom-up. No data-dependent control flow — dead
rays (misses, zero-weight children) are masked lanes, which is exactly what
the VPU wants.

Feature parity checklist (each item cites the reference behaviour):
  - nearest-hit + hard sun shadows w/ backface "cheat" n·sun>0 (main.rs:189)
  - Lambertian direct light: color * (n·sun) * (albedo/π), sun intensity 1
    (main.rs:235-240; albedo pre-divided by π at Material::new)
  - mirror reflection d - 2n(d·n), weight = reflectivity, depth < 4
    (main.rs:243-257)
  - diffuse GI: 10 cosine-weighted rays, weight = hit_color*(n·ω)*roughness,
    averaged (main.rs:259-299)
  - self-intersection offset n * 1e-5 (main.rs:121-124)
  - miss -> sky #87ceeb (main.rs:302-304)
  - gamma 1/2.2 applied per primary sample at depth 1, *before* the spp
    average (main.rs:306-310 + :365)

Known reference quirks NOT reproduced (documented in SURVEY.md §2.4): the
stale-`closest` rest-triangle bug (main.rs:157-169) and the integer aspect
ratio (main.rs:314) — both are bugs, not capabilities.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from raytracing_tpu.accel.packets import ClusterAccel
from raytracing_tpu.config import RenderConfig
from raytracing_tpu.geometry.mesh import Mesh, Scene
from raytracing_tpu.models.camera import camera_rays
from raytracing_tpu.ops.color import gamma_correct
from raytracing_tpu.ops.intersect import reflect, triangle_normal
from raytracing_tpu.ops.linalg import dot, normalize
from raytracing_tpu.ops.sampling import cosine_hemisphere
from raytracing_tpu.kernels.binning import ray_bin_order, scene_bounds
from raytracing_tpu.ops.trace import Hit
from raytracing_tpu.tracer import any_hit, nearest_hit, nearest_hit_shaded


def _attribute_rows(mesh: Mesh) -> jnp.ndarray:
    """Per-triangle shading attributes as one [T, 9] row table:
    normal(3) | color(3) | albedo/pi, reflectivity, roughness."""
    return jnp.concatenate(
        [mesh.normals, mesh.colors, mesh.materials[mesh.obj_id]], axis=1
    )


class Shaded(NamedTuple):
    """Per-ray shading state at one wavefront level (all sanitized: finite
    even on miss lanes, so downstream where() masks can't see NaNs)."""

    direct: jnp.ndarray  # [N, 3] direct sun radiance (0 unless lit)
    n: jnp.ndarray       # [N, 3] shading normal
    pos: jnp.ndarray     # [N, 3] offset hit position
    color: jnp.ndarray   # [N, 3] triangle base color
    refl: jnp.ndarray    # [N] material reflectivity
    rough: jnp.ndarray   # [N] material roughness (diffuse weight)


def shade(
    mesh: Mesh,
    accel: Optional[ClusterAccel],
    sun: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    hit: Hit,
    config: RenderConfig,
    attrs: Optional[jnp.ndarray] = None,
) -> Shaded:
    """Direct lighting at hit points, incl. the shadow (any-hit) query —
    the reference's main.rs:176-241 in batch form.

    attrs: optional [N, 9] kernel-accumulated attribute rows (pallas fast
    path, see tracer.nearest_hit_shaded) — when given, NO per-ray gather
    happens here. When absent, one fused row gather fetches all 9
    per-triangle attributes (separate normals/colors/materials gathers
    each cost a full serial gather pass on TPU)."""
    # Miss lanes carry tri id 0 / t=1.0: harmless garbage killed by masks.
    t_safe = jnp.where(hit.hit, hit.t, 1.0)
    idx = hit.tri
    idx_is_slot = attrs is not None  # kernel attrs => idx is a packed slot
    if attrs is None:
        attrs = jnp.take(_attribute_rows(mesh), idx, axis=0)  # [N, 9]
    if config.normals == "geometric":
        # Geometric normals need the vertex gathers regardless (they depend
        # on live verts for autodiff). With kernel attrs (pallas fast
        # path), idx is a packed slot — resolve through accel.order first.
        tri_ids = accel.order[idx] if idx_is_slot else idx
        tv = mesh.tri_v[tri_ids]
        n = triangle_normal(
            mesh.verts[tv[:, 0]], mesh.verts[tv[:, 1]], mesh.verts[tv[:, 2]]
        )
    else:
        n = attrs[:, 0:3]
    pos = o + t_safe[:, None] * d + n * config.normal_offset
    color = attrs[:, 3:6]
    albedo_pi, refl, rough = attrs[:, 6], attrs[:, 7], attrs[:, 8]

    sun_dir = normalize(sun - pos, eps=1e-20)
    ndl = dot(n, sun_dir)
    facing = ndl > 0.0  # the reference's backface "cheat" (main.rs:189)
    # Shadow rays only matter where they can change the result; mark the
    # rest dead (miss lanes and backfacing hits) — the wavefront carries
    # them at static shape, but accelerated backends cull dead lanes from
    # their tile decisions and all-dead tiles trace for free. The query is
    # BINNED by hit position: one parent tile's hit points can straddle
    # surfaces tens of units apart (teapot silhouette + ground behind it),
    # and a mixed tile's frustum covers everything in between.
    sh_alive = hit.hit & facing
    if config.backend == "pallas" and accel is not None:
        lo, hi = scene_bounds(accel)
        order, inv = ray_bin_order(pos, sun_dir, lo, hi, sh_alive)
        occluded = any_hit(mesh, accel, pos[order], sun_dir[order], config,
                           alive=sh_alive[order])[inv]
    else:
        occluded = any_hit(mesh, accel, pos, sun_dir, config,
                           alive=sh_alive)
    lit = hit.hit & facing & ~occluded
    direct = jnp.where(
        lit[:, None], color * (ndl * albedo_pi)[:, None], 0.0
    )
    return Shaded(direct=direct, n=n, pos=pos, color=color, refl=refl,
                  rough=rough)


def render_rays(
    mesh: Mesh,
    accel: Optional[ClusterAccel],
    sun: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    key: jax.Array,
    config: RenderConfig,
) -> jnp.ndarray:
    """Radiance for a batch of primary rays [R, 3] -> gamma-corrected RGB
    [R, 3]. The full ray tree is unrolled into max_depth wavefront levels."""
    max_depth = max(config.reflect_depth, config.diffuse_depth)
    s = config.diffuse_scatter
    sky = jnp.asarray(config.sky_color, dtype=o.dtype)

    # ---- forward sweep: trace + shade each level, spawn children --------
    levels = []
    o_l, d_l = o, d
    alive_l = None  # primary rays are all alive
    for depth in range(1, max_depth + 1):
        n_l = o_l.shape[0]
        if depth > 1 and config.backend == "pallas" and accel is not None:
            # Bounce levels inherit parent order; re-bin by (origin cell,
            # direction cone) so ray tiles stay cullable, then gather the
            # per-ray outputs back to parent order for the radiance sweep.
            lo_, hi_ = scene_bounds(accel)
            order, inv = ray_bin_order(o_l, d_l, lo_, hi_, alive_l)
            h, attrs = nearest_hit_shaded(mesh, accel, o_l[order],
                                          d_l[order], config,
                                          alive=alive_l[order])
            sh = shade(mesh, accel, sun, o_l[order], d_l[order], h, config,
                       attrs=attrs)
            h = Hit(t=h.t[inv], tri=h.tri[inv], hit=h.hit[inv])
            sh = Shaded(*(x[inv] for x in sh))
        else:
            h, attrs = nearest_hit_shaded(mesh, accel, o_l, d_l, config,
                                          alive=alive_l)
            sh = shade(mesh, accel, sun, o_l, d_l, h, config, attrs=attrs)
        has_r = depth < config.reflect_depth
        has_d = depth < config.diffuse_depth
        info = {"hit": h.hit, "direct": sh.direct, "has_r": has_r,
                "has_d": has_d, "n_rays": n_l}
        if has_r or has_d:
            parts_o, parts_d, parts_a = [], [], []
            if has_r:
                # Children with zero throughput are dead on arrival; keep
                # the slot (static wavefront shape) but mark it dead.
                parts_o.append(sh.pos)
                parts_d.append(reflect(d_l, sh.n))
                parts_a.append(h.hit & (sh.refl > 0.0))
                info["w_refl"] = jnp.where(h.hit[:, None], sh.refl[:, None], 0.0)
            if has_d:
                kd = jax.random.fold_in(key, depth)
                wdirs = cosine_hemisphere(kd, sh.n, shape=(s,))  # [s, N, 3]
                cosj = dot(jnp.broadcast_to(sh.n[None], wdirs.shape), wdirs)
                w_d = sh.color[None] * (cosj * sh.rough[None])[..., None]
                info["w_diff"] = jnp.where(h.hit[None, :, None], w_d, 0.0)
                parts_o.append(
                    jnp.broadcast_to(sh.pos[None], (s, n_l, 3)).reshape(s * n_l, 3)
                )
                parts_d.append(wdirs.reshape(s * n_l, 3))
                parts_a.append(
                    jnp.broadcast_to((h.hit & (sh.rough > 0.0))[None],
                                     (s, n_l)).reshape(s * n_l)
                )
            o_l = jnp.concatenate(parts_o, axis=0)
            d_l = jnp.concatenate(parts_d, axis=0)
            alive_l = jnp.concatenate(parts_a, axis=0)
        levels.append(info)

    # ---- backward sweep: accumulate radiance bottom-up ------------------
    rad = None  # radiance of the (children of the) level below
    for info in reversed(levels):
        n_l = info["n_rays"]
        contrib = info["direct"]
        off = 0
        if info["has_r"]:
            contrib = contrib + info["w_refl"] * rad[:n_l]
            off = n_l
        if info["has_d"]:
            rd = rad[off:].reshape(s, n_l, 3)
            contrib = contrib + jnp.mean(info["w_diff"] * rd, axis=0)
        rad = jnp.where(info["hit"][:, None], contrib, sky)

    return gamma_correct(rad, config.gamma)


def _pad_to_multiple(x: jnp.ndarray, m: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % m
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])])
    return x


def render(
    scene: Scene,
    config: RenderConfig,
    accel: Optional[ClusterAccel] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Render a full frame -> [H, W, 3] float RGB in [0, 1]-ish.

    Primary rays are processed in chunks of config.chunk_size via lax.map so
    peak memory stays bounded while the whole frame remains one traced
    computation — the TPU replacement for the reference's rayon scanline
    fan-out (main.rs:317-319).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    o, d = camera_rays(config)
    spp, h, w = o.shape[:3]
    r = spp * h * w
    o = o.reshape(r, 3)
    d = d.reshape(r, 3)
    # Pixel-block ray order: the traversal kernel culls per tile of
    # consecutive rays, and a 16x16-pixel block's frustum intersects ~3x
    # fewer clusters than a flat scanline strip. Applied on EVERY backend
    # (it is order-only) so the per-ray RNG assignment — and therefore the
    # rendered image — is bit-identical across backends.
    from raytracing_tpu.models.camera import block_permutation

    perm, inv = block_permutation(spp, h, w, 16, 16)
    o = o[perm]
    d = d[perm]
    chunk = min(config.chunk_size, r)
    o = _pad_to_multiple(o, chunk)
    d = _pad_to_multiple(d, chunk)
    nc = o.shape[0] // chunk
    keys = jax.random.split(key, nc)

    body = partial(render_rays, scene.mesh, accel, scene.sun, config=config)
    rgb = jax.lax.map(
        lambda args: body(args[0], args[1], key=args[2]),
        (o.reshape(nc, chunk, 3), d.reshape(nc, chunk, 3), keys),
    )
    rgb = rgb.reshape(-1, 3)[inv]
    # Per-sample gamma already applied (reference order); average the spp.
    return rgb.reshape(spp, h, w, 3).mean(axis=0)
