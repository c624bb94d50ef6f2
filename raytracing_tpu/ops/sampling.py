"""Stochastic sampling — cosine-weighted hemisphere scatter + tangent frames.

Replaces the reference's `rand::random` + `get_tangent_vectors` diffuse
scatter (/root/reference/src/main.rs:74-86, :262-281) with counter-based
`jax.random` so renders are reproducible and trivially shardable: every ray
derives its own key, no sequential RNG state crosses device boundaries.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from raytracing_tpu.ops.linalg import cross, normalize


def tangent_frame(n: jnp.ndarray, eps: float = 1e-6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal tangent basis (t1, t2) for normals n [..., 3].

    Same construction as the reference (main.rs:74-86): pick an arbitrary
    axis (Z if |n.z| < 1e-6 else X), t1 = normalize(n x arb), t2 =
    normalize(n x t1) — branchless via where.
    """
    z_small = jnp.abs(n[..., 2]) < eps
    arb = jnp.where(
        z_small[..., None],
        jnp.array([0.0, 0.0, 1.0], dtype=n.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
    )
    t1 = normalize(cross(n, arb), eps=1e-20)
    t2 = normalize(cross(n, t1), eps=1e-20)
    return t1, t2


def cosine_hemisphere(
    key: jax.Array, n: jnp.ndarray, shape: Tuple[int, ...] = ()
) -> jnp.ndarray:
    """Cosine-weighted directions about normals n [..., 3].

    Matches the reference's distribution (main.rs:262-276): sin_theta =
    sqrt(u1), cos_theta = sqrt(1 - u1), psi = 2*pi*u2, dir = a*t1 + b*t2 +
    c*n, normalized. `shape` prepends extra sample dims.
    """
    batch = shape + n.shape[:-1]
    u = jax.random.uniform(key, batch + (2,), dtype=n.dtype)
    sin_theta = jnp.sqrt(u[..., 0])
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    psi = 2.0 * jnp.pi * u[..., 1]
    a = sin_theta * jnp.cos(psi)
    b = sin_theta * jnp.sin(psi)
    t1, t2 = tangent_frame(n)
    d = a[..., None] * t1 + b[..., None] * t2 + cos_theta[..., None] * n
    return normalize(d, eps=1e-20)


def sample_cone(
    key: jax.Array, axis: jnp.ndarray, cos_max: jnp.ndarray,
    shape: Tuple[int, ...] = ()
) -> jnp.ndarray:
    """Uniform directions inside the cone of half-angle acos(cos_max)
    around unit axes [..., 3] — the standard spherical-light solid-angle
    sampler. cos_theta ~ U[cos_max, 1]; pdf = 1 / (2*pi*(1 - cos_max)).
    `shape` prepends extra sample dims."""
    batch = shape + axis.shape[:-1]
    u = jax.random.uniform(key, batch + (2,), dtype=axis.dtype)
    cos_t = 1.0 - u[..., 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    psi = 2.0 * jnp.pi * u[..., 1]
    t1, t2 = tangent_frame(axis)
    d = (
        (sin_t * jnp.cos(psi))[..., None] * t1
        + (sin_t * jnp.sin(psi))[..., None] * t2
        + cos_t[..., None] * axis
    )
    return normalize(d, eps=1e-20)


def stratified_grid(spp: int) -> Tuple[int, int]:
    """Stratification grid (gx, gy) with gx * gy == spp: the largest
    divisor pair closest to square (4 -> 2x2, 2 -> 1x2, 8 -> 2x4, 6 ->
    2x3). Any positive spp is valid — non-square counts just stratify on
    a rectangular grid."""
    if spp < 1:
        raise ValueError("spp must be >= 1")
    gx = int(spp ** 0.5)
    while spp % gx:
        gx -= 1
    return gx, spp // gx


def stratified_offsets(spp: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sub-pixel sample offsets [spp, 2] on a gx x gy cell-center grid
    (see stratified_grid).

    For spp=4 this reproduces the reference's fixed pattern (main.rs:321-364):
    (0.25, 0.25), (0.75, 0.75), (0.25, 0.75), (0.75, 0.25) — cell centers of
    the 2x2 grid (order differs; the average is order-independent).
    """
    gx, gy = stratified_grid(spp)
    cx = (jnp.arange(gx, dtype=dtype) + 0.5) / gx
    cy = (jnp.arange(gy, dtype=dtype) + 0.5) / gy
    xx, yy = jnp.meshgrid(cx, cy, indexing="ij")
    return jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
