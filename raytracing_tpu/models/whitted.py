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
from raytracing_tpu.ops.trace import Hit
from raytracing_tpu.tracer import any_hit, nearest_hit


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
) -> Shaded:
    """Direct lighting at hit points, incl. the shadow (any-hit) query —
    the reference's main.rs:176-241 in batch form."""
    # Miss lanes carry tri id 0 / t=1.0: harmless garbage killed by masks.
    t_safe = jnp.where(hit.hit, hit.t, 1.0)
    idx = hit.tri
    if config.normals == "geometric":
        tv = mesh.tri_v[idx]
        n = triangle_normal(
            mesh.verts[tv[:, 0]], mesh.verts[tv[:, 1]], mesh.verts[tv[:, 2]]
        )
    else:
        n = mesh.normals[idx]
    pos = o + t_safe[:, None] * d + n * config.normal_offset
    color = mesh.colors[idx]
    mat = mesh.materials[mesh.obj_id[idx]]
    albedo_pi, refl, rough = mat[:, 0], mat[:, 1], mat[:, 2]

    sun_dir = normalize(sun - pos, eps=1e-20)
    ndl = dot(n, sun_dir)
    facing = ndl > 0.0  # the reference's backface "cheat" (main.rs:189)
    occluded = any_hit(mesh, accel, pos, sun_dir, config)
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
    for depth in range(1, max_depth + 1):
        n_l = o_l.shape[0]
        h = nearest_hit(mesh, accel, o_l, d_l, config)
        sh = shade(mesh, accel, sun, o_l, d_l, h, config)
        has_r = depth < config.reflect_depth
        has_d = depth < config.diffuse_depth
        info = {"hit": h.hit, "direct": sh.direct, "has_r": has_r,
                "has_d": has_d, "n_rays": n_l}
        if has_r or has_d:
            parts_o, parts_d = [], []
            if has_r:
                parts_d.append(reflect(d_l, sh.n))
                parts_o.append(sh.pos)
                info["w_refl"] = jnp.where(h.hit[:, None], sh.refl[:, None], 0.0)
            if has_d:
                kd = jax.random.fold_in(key, depth)
                wdirs = cosine_hemisphere(kd, sh.n, shape=(s,))  # [s, N, 3]
                cosj = dot(jnp.broadcast_to(sh.n[None], wdirs.shape), wdirs)
                w_d = sh.color[None] * (cosj * sh.rough[None])[..., None]
                info["w_diff"] = jnp.where(h.hit[None, :, None], w_d, 0.0)
                parts_d.append(wdirs.reshape(s * n_l, 3))
                parts_o.append(
                    jnp.broadcast_to(sh.pos[None], (s, n_l, 3)).reshape(s * n_l, 3)
                )
            o_l = jnp.concatenate(parts_o, axis=0)
            d_l = jnp.concatenate(parts_d, axis=0)
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
    rgb = rgb.reshape(-1, 3)[:r]
    # Per-sample gamma already applied (reference order); average the spp.
    return rgb.reshape(spp, h, w, 3).mean(axis=0)
