"""Midpoint (1:4) triangle subdivision — scales any mesh to the ~1M-triangle
regime (BASELINE config 4: "~1M-triangle mesh (subdivided teapot)").

Each level splits every triangle into 4 at its edge midpoints, deduplicating
midpoint vertices through a shared edge map so the result stays a watertight
indexed mesh (T -> 4T triangles, V -> V + E vertices). Midpoint subdivision
of flat triangles reproduces the SAME surface exactly — renders of the
subdivided mesh must match the original up to floating-point edge cases —
which makes it both a large-scene stress generator and its own correctness
oracle. Host-side numpy; runs once at scene build.

The reference has no counterpart (its scene is fixed at 12,642 triangles);
this exists because a TPU chip is bored at that size.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def subdivide_arrays(
    verts: np.ndarray, tri_v: np.ndarray, levels: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """(verts [V,3], tri_v [T,3]) -> subdivided (verts', tri_v'), numpy."""
    verts = np.asarray(verts, dtype=np.float32)
    tri_v = np.asarray(tri_v, dtype=np.int64)
    for _ in range(levels):
        a, b, c = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]
        # Canonical (lo, hi) edge keys shared across adjacent triangles.
        edges = np.concatenate(
            [np.stack([a, b], 1), np.stack([b, c], 1), np.stack([c, a], 1)]
        )
        edges.sort(axis=1)
        uniq, inv = np.unique(edges, axis=0, return_inverse=True)
        mid = verts[uniq].mean(axis=1)  # [E, 3]
        v0 = verts.shape[0]
        verts = np.concatenate([verts, mid.astype(np.float32)])
        t = tri_v.shape[0]
        mab = v0 + inv[:t]
        mbc = v0 + inv[t:2 * t]
        mca = v0 + inv[2 * t:]
        tri_v = np.concatenate(
            [
                np.stack([a, mab, mca], 1),
                np.stack([mab, b, mbc], 1),
                np.stack([mca, mbc, c], 1),
                np.stack([mab, mbc, mca], 1),
            ]
        )
    return verts, tri_v.astype(np.int32)
