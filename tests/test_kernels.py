"""Pallas megakernel tests (interpret mode on CPU — the driver/bench
exercise the compiled TPU path; these pin down semantics vs the oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.accel.packets import build_cluster_accel
from raytracing_tpu.geometry.mesh import triangle_soa
from raytracing_tpu.geometry.scene import teapot_only_mesh
from raytracing_tpu.kernels.traverse import (
    any_hit_pallas,
    nearest_hit_pallas,
    pack_tri_blocks,
)
from raytracing_tpu.ops.trace import any_hit_brute, nearest_hit_brute


@pytest.fixture(scope="module")
def setup(rng):
    mesh = teapot_only_mesh()
    accel = build_cluster_accel(mesh, cluster_size=128)
    n = 128
    o = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    o[:, 2] = 0.0
    tgt = np.array([0.0, 0.0, 3.0]) + rng.normal(size=(n, 3)).astype(np.float32)
    d = (tgt - o).astype(np.float32)
    return mesh, accel, jnp.asarray(o), jnp.asarray(d)


def test_pallas_nearest_matches_oracle(setup):
    mesh, accel, o, d = setup
    hb = nearest_hit_brute(triangle_soa(mesh.verts, mesh.tri_v), o, d)
    hp = nearest_hit_pallas(mesh, accel, o, d, interpret=True)
    m = np.asarray(hb.hit)
    np.testing.assert_array_equal(m, np.asarray(hp.hit))
    np.testing.assert_array_equal(np.asarray(hb.tri)[m], np.asarray(hp.tri)[m])
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(hp.t)[m],
                               rtol=1e-5)


def test_pallas_anyhit_matches_oracle(setup):
    mesh, accel, o, d = setup
    ab = any_hit_brute(triangle_soa(mesh.verts, mesh.tri_v), o, d)
    ap = any_hit_pallas(mesh, accel, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(ab), np.asarray(ap))


def test_pack_tri_blocks_layout(setup):
    mesh, accel, _, _ = setup
    blocks, bounds = pack_tri_blocks(mesh, accel)
    c, rows, cs = blocks.shape
    assert rows == 9 and cs == accel.cluster_size and c == accel.num_clusters
    assert bounds.shape == (6, c)
    # Row layout: v0(3) e1(3) e2(3) per cluster, triangles on lanes.
    from raytracing_tpu.accel.packets import packed_triangles

    tri = packed_triangles(mesh, accel)
    np.testing.assert_allclose(
        np.asarray(blocks[0, 0, :]), np.asarray(tri.v0[:cs, 0]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(blocks[0, 3, :]), np.asarray(tri.e1[:cs, 0]), atol=0
    )
