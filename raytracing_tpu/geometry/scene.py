"""Scene construction — the default two-teapots-and-a-ground-plane scene.

Capability parity with the reference's hardcoded scene (/root/reference/src/
main.rs:406-464): teapot #1 at (-0.9, -2, 9), emerald #50c878, material
(albedo 1, reflectivity 0.9, roughness 0.1); teapot #2 at (3, -2, 6), red,
(1, 0.025, 0.975); ground plane = 2 triangles spanning +/-10,000 at y = -3,
gray 128, (1, 0, 1), with both normals forced to +y (the second triangle's
winding gives a geometric -y normal; the reference overrides it,
main.rs:432-441). The sun orbits per wall-clock time exactly as in
main.rs:479-484.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from raytracing_tpu import config as cfg
from raytracing_tpu.geometry.mesh import Mesh, Scene, concat_objects
from raytracing_tpu.geometry.obj import read_obj

ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
)
TEAPOT_OBJ = os.path.join(ASSET_DIR, "teapot.obj")


def ground_plane_object(
    half_extent: float = 10_000.0,
    y: float = -3.0,
    color=cfg.GROUND_COLOR,
    material=cfg.GROUND_MATERIAL,
) -> dict:
    verts = np.array(
        [
            [-half_extent, y, -half_extent],
            [-half_extent, y, half_extent],
            [half_extent, y, half_extent],
            [half_extent, y, -half_extent],
        ],
        dtype=np.float32,
    )
    tri_v = np.array([[0, 1, 2], [0, 3, 2]], dtype=np.int32)
    normals = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], dtype=np.float32)
    return {
        "verts": verts,
        "tri_v": tri_v,
        "colors": np.asarray(color, dtype=np.float32),
        "normals": normals,
        "material": material,
    }


def build_default_mesh(obj_path: Optional[str] = None) -> Mesh:
    obj_path = obj_path or TEAPOT_OBJ
    objects = [
        read_obj(obj_path, offset=(-0.9, -2.0, 9.0), color=cfg.TEAPOT1_COLOR,
                 material=cfg.TEAPOT1_MATERIAL),
        read_obj(obj_path, offset=(3.0, -2.0, 6.0), color=cfg.TEAPOT2_COLOR,
                 material=cfg.TEAPOT2_MATERIAL),
        ground_plane_object(),
    ]
    return concat_objects(objects)


def sun_position(t: float) -> jnp.ndarray:
    """Animated sun orbit (main.rs:479-484): far-away point light."""
    return jnp.array(
        [jnp.sin(t / 10.0) * 100_000.0, 25_000.0, jnp.cos(t / 10.0) * 100_000.0],
        dtype=jnp.float32,
    )


def build_default_scene(t: float = 0.0, obj_path: Optional[str] = None) -> Scene:
    return Scene(mesh=build_default_mesh(obj_path), sun=sun_position(t))


def teapot_only_mesh(offset=(0.0, 0.0, 3.0), color=(0.8, 0.8, 0.8),
                     material=(1.0, 0.0, 1.0), obj_path: Optional[str] = None) -> Mesh:
    """Single-teapot mesh for tests/benchmarks (BASELINE configs 1-2)."""
    obj_path = obj_path or TEAPOT_OBJ
    return concat_objects([read_obj(obj_path, offset=offset, color=color,
                                    material=material)])


def subdivided_teapot_mesh(levels: int = 3, offset=(0.0, 0.0, 3.0),
                           color=(0.8, 0.8, 0.8), material=(1.0, 0.0, 1.0),
                           obj_path: Optional[str] = None) -> Mesh:
    """Midpoint-subdivided teapot for large-scene stress (BASELINE config 4:
    "~1M-triangle mesh (subdivided teapot)"): 6,320 * 4^levels triangles on
    the EXACT same surface (levels=3 -> 404k, levels=4 -> 1.6M). Renders
    must match the unsubdivided teapot (tests/test_geometry.py)."""
    from raytracing_tpu.geometry.subdivide import subdivide_arrays

    obj_path = obj_path or TEAPOT_OBJ
    ob = read_obj(obj_path, offset=offset, color=color, material=material)
    verts, tri_v = subdivide_arrays(ob["verts"], ob["tri_v"], levels)
    return concat_objects([{
        "verts": verts,
        "tri_v": tri_v,
        "colors": np.asarray(color, dtype=np.float32),
        "material": material,
    }])
