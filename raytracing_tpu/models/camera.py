"""Pinhole camera ray generation with stratified supersampling.

Reproduces the reference's camera (/root/reference/src/main.rs:313-365):
origin at (0,0,0) looking down +z with the focal plane at z = 1,
xx = (2 (x + ox) / W - 1) * aspect * scale, yy = (1 - 2 (y + oy) / H) * scale,
direction (xx, yy, 1) left UNnormalized (the reference never normalizes
primary rays; t is in dir-length units, shading is unaffected because
normals and light directions are normalized separately). One deliberate fix:
aspect is true float W/H, not the reference's integer division
(main.rs:314, a latent bug for non-square windows; identical at 800x800).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from raytracing_tpu.config import RenderConfig
from raytracing_tpu.ops.sampling import stratified_offsets


def camera_rays(config: RenderConfig, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All primary rays for a frame.

    Returns (o, d) of shape [spp, H, W, 3]. Origins are all zero; kept as an
    array so alternative cameras (offset/animated) slot in transparently.
    """
    w, h, spp = config.width, config.height, config.samples_per_pixel
    aspect = float(w) / float(h)
    offs = stratified_offsets(spp, dtype)  # [spp, 2]
    x = jnp.arange(w, dtype=dtype)
    y = jnp.arange(h, dtype=dtype)
    ox = offs[:, 0][:, None, None]
    oy = offs[:, 1][:, None, None]
    xx = (2.0 * (x[None, None, :] + ox) / w - 1.0) * aspect * config.scale
    yy = (1.0 - 2.0 * (y[None, :, None] + oy) / h) * config.scale
    xx, yy = jnp.broadcast_to(xx, (spp, h, w)), jnp.broadcast_to(yy, (spp, h, w))
    d = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    o = jnp.zeros_like(d)
    return o, d
