"""Wavefront OBJ loading.

Capability parity with the reference's `read_obj` (/root/reference/src/
main.rs:38-72): `v `/`f ` lines only, whitespace-split, 1-based indices,
per-object translation offset applied at load, a single uniform color, and
face normals precomputed from winding. Extensions beyond the reference: quad
faces are fan-triangulated, negative OBJ indices are resolved, and `v`/`f`
lines with `v/vt/vn` syntax have their position index extracted (the
reference would silently mis-parse those; teapot.obj contains none).

A native C++ fast path (csrc/raytracing_native.cpp) is used when the shared
library has been built; the numpy path is the always-available fallback and
the correctness oracle for it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _parse_index(token: str, nverts: int) -> int:
    tok = token.split("/", 1)[0]
    idx = int(tok)
    return idx - 1 if idx > 0 else nverts + idx


def read_obj_numpy(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file -> (verts [V,3] f32, tri_v [T,3] i32)."""
    verts = []
    faces = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("f "):
                parts = line.split()[1:]
                idx = [_parse_index(p, len(verts)) for p in parts]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append((idx[0], idx[k], idx[k + 1]))
    return (
        np.asarray(verts, dtype=np.float32),
        np.asarray(faces, dtype=np.int32).reshape(-1, 3),
    )


def read_obj(
    path: str,
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    material: Tuple[float, float, float] = (1.0, 0.0, 1.0),
) -> dict:
    """Load an OBJ into an object dict consumable by
    `geometry.mesh.concat_objects`. Mirrors the reference loader's signature
    (filename, offset, color) with the material attached (the reference
    attaches it at `Object::from`, main.rs:417-431)."""
    from raytracing_tpu.geometry import native

    parsed = native.parse_obj(path) if native.available() else None
    verts, tri_v = parsed if parsed is not None else read_obj_numpy(path)
    verts = verts + np.asarray(offset, dtype=np.float32)
    return {
        "verts": verts,
        "tri_v": tri_v,
        "colors": np.asarray(color, dtype=np.float32),
        "material": material,
    }
