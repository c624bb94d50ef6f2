"""Tests of OBJ loading and SoA mesh construction."""

import numpy as np

from raytracing_tpu.geometry.mesh import concat_objects, triangle_soa
from raytracing_tpu.geometry.obj import read_obj, read_obj_numpy
from raytracing_tpu.geometry.scene import (
    TEAPOT_OBJ,
    build_default_mesh,
    build_default_scene,
    sun_position,
)


def test_read_teapot_counts():
    verts, tris = read_obj_numpy(TEAPOT_OBJ)
    # Counted from the asset; the reference prints 12642 total for 2 teapots
    # + 2 plane tris (main.rs:456-459) => 6320 per teapot, 3644 verts.
    assert verts.shape == (3644, 3)
    assert tris.shape == (6320, 3)
    assert tris.min() == 0 and tris.max() == 3643


def test_read_obj_applies_offset_and_color():
    ob = read_obj(TEAPOT_OBJ, offset=(1.0, 2.0, 3.0), color=(0.5, 0.5, 0.5))
    base, _ = read_obj_numpy(TEAPOT_OBJ)
    np.testing.assert_allclose(ob["verts"], base + [1.0, 2.0, 3.0], atol=1e-6)


def test_obj_parser_extensions(tmp_path):
    # quads fan-triangulate; v/vt/vn syntax and negative indices resolve.
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"
        "f -4 -3 -2\n"
    )
    verts, tris = read_obj_numpy(str(p))
    assert verts.shape == (4, 3)
    assert tris.tolist() == [[0, 1, 2], [0, 2, 3], [0, 1, 2]]


def test_default_scene_structure():
    mesh = build_default_mesh()
    assert mesh.num_triangles == 2 * 6320 + 2  # reference scene total: 12642
    assert mesh.num_objects == 3
    # Ground normals forced +y on BOTH tris (main.rs:432-441) even though the
    # second triangle's winding is -y.
    np.testing.assert_allclose(np.asarray(mesh.normals[-2:]),
                               [[0, 1, 0], [0, 1, 0]], atol=0)
    # Materials stored albedo/pi (objects.rs:184-190).
    np.testing.assert_allclose(np.asarray(mesh.materials[:, 0]),
                               1.0 / np.pi, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mesh.materials[:, 1]),
                               [0.9, 0.025, 0.0], rtol=1e-6)


def test_normals_unit_and_bounds():
    mesh = build_default_mesh()
    n = np.asarray(mesh.normals)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    b = np.asarray(mesh.obj_bounds)
    assert (b[:, 0] <= b[:, 1]).all()


def test_triangle_soa_consistency():
    mesh = build_default_mesh()
    tri = triangle_soa(mesh.verts, mesh.tri_v)
    v = np.asarray(mesh.verts)
    tv = np.asarray(mesh.tri_v)
    np.testing.assert_allclose(np.asarray(tri.v0), v[tv[:, 0]], atol=0)
    np.testing.assert_allclose(np.asarray(tri.e1), v[tv[:, 1]] - v[tv[:, 0]],
                               atol=0)


def test_sun_orbit():
    s0 = np.asarray(sun_position(0.0))
    np.testing.assert_allclose(s0, [0.0, 25000.0, 100000.0], atol=1e-2)
    s = np.asarray(sun_position(5.0))
    np.testing.assert_allclose(np.hypot(s[0], s[2]), 100000.0, rtol=1e-5)


def test_scene_pytree():
    import jax

    scene = build_default_scene()
    leaves = jax.tree_util.tree_leaves(scene)
    assert all(hasattr(l, "shape") for l in leaves)
