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


def block_permutation(
    spp: int, h: int, w: int, block_h: int = 8, block_w: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray permutation that groups all spp samples of a block_h x block_w
    PIXEL BLOCK into one contiguous run of spp*block_h*block_w rays.

    Rationale: the traversal kernels cull the scene per RAY TILE of
    consecutive rays (kernels/traverse.RAY_TILE). In flat [spp, H, W] order
    a tile is a 1-pixel-tall scanline strip whose bounding frustum is wide
    and flat; an 8x8 pixel block (x4 spp = 256 rays) subtends a compact
    frustum and intersects ~3x fewer clusters on the reference teapot frame.
    This is the TPU counterpart of the reference's scanline rayon split
    (main.rs:317-319) — the split axis is chosen for culling coherence, not
    thread count.

    Returns (perm, inv) with perm.shape == (spp*h*w,):
      rays_blocked = rays.reshape(-1, 3)[perm]
      result_flat  = result_blocked[inv]
    H/W not divisible by the block are handled by shrinking the last
    blocks (permutation stays exact, tiles just lose some coherence).
    """
    import numpy as np

    idx = np.arange(spp * h * w, dtype=np.int64).reshape(spp, h, w)
    bh, bw = min(block_h, h), min(block_w, w)
    rows = [r for r in range(0, h, bh)]
    cols = [c for c in range(0, w, bw)]
    parts = []
    for r in rows:
        for c in cols:
            parts.append(idx[:, r:r + bh, c:c + bw].reshape(-1))
    perm = np.concatenate(parts)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int64)
    return jnp.asarray(perm, jnp.int32), jnp.asarray(inv, jnp.int32)
