"""Image output.

The reference presents frames only through a winit window + `pixels` GPU blit
(/root/reference/src/main.rs:383-399, :497-500) and never writes to disk;
windowing is incidental to capability (SURVEY.md §7), so the framework's
presentation layer is a framebuffer writer: RGBA8 conversion with the
reference's clamp semantics plus PNG/NPY encoders (PIL when present, a
minimal self-contained PNG encoder otherwise).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from raytracing_tpu.ops.color import to_rgba_frame


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write [H, W, 3] float RGB (0..1-ish) to a PNG file."""
    frame = to_rgba_frame(rgb)
    try:
        from PIL import Image

        Image.fromarray(frame, mode="RGBA").save(path)
        return
    except ImportError:
        pass
    _write_png_raw(path, frame)


def _write_png_raw(path: str, rgba: np.ndarray) -> None:
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def write_npy(path: str, rgb: np.ndarray) -> None:
    np.save(path, np.asarray(rgb))
