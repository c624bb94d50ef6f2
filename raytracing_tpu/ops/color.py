"""Color pipeline: gamma, sky, u8 quantization.

Replaces the reference's `Color`/`ScreenColor` structs and their scalar ops
(/root/reference/src/objects.rs:76-174) with [..., 3] float arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gamma_correct(rgb: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Per-channel pow(1/gamma), applied once at the top of the ray tree —
    the reference applies it per primary sample at depth == 1
    (main.rs:306-310) *before* averaging the 4 samples; callers must match
    that ordering for parity.

    Gradient-safety: d/dx x^(1/2.2) -> inf at x = 0 (black pixels are
    common: shadowed hits), so the pow is evaluated at a clamped argument
    and exact zeros pass through a where() — forward values match the
    reference's plain powf for x = 0 and x >= 1e-6."""
    y = jnp.power(jnp.maximum(rgb, 1e-6), 1.0 / gamma)
    return jnp.where(rgb <= 0.0, 0.0, y)


def to_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """Float RGB -> u8 with the reference's clamp semantics
    (`ScreenColor::from`, objects.rs:90-98): scale by 255, min with 255,
    truncate toward zero (Rust `as u8` truncates)."""
    return jnp.minimum(rgb * 255.0, 255.0).astype(jnp.uint8)


def to_rgba_frame(rgb: jnp.ndarray) -> np.ndarray:
    """[H, W, 3] float -> [H, W, 4] u8 RGBA frame with alpha 0xff, matching
    the reference framebuffer layout (main.rs:371-378)."""
    rgb8 = np.asarray(to_u8(rgb))
    frame = np.empty(rgb8.shape[:-1] + (4,), dtype=np.uint8)
    frame[..., :3] = rgb8
    frame[..., 3] = 0xFF
    return frame
