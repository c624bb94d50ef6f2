"""Unit tests of the intersection math (ops/intersect.py).

Far beyond the reference's single scalar box test (objects.rs:335-354) and
its stale SIMD packing test (simd_accel.rs:379-476, broken — SURVEY.md §4):
analytic cases + randomized cross-checks against a plain numpy oracle.
"""

import jax.numpy as jnp
import numpy as np

from raytracing_tpu.ops.intersect import (
    TriangleSoA,
    moller_trumbore,
    ray_sphere,
    reflect,
    slab_test,
    triangle_normal,
)


def make_tri(a, b, c):
    a, b, c = (np.asarray(v, dtype=np.float32) for v in (a, b, c))
    return TriangleSoA(
        v0=jnp.asarray(a[None]), e1=jnp.asarray((b - a)[None]),
        e2=jnp.asarray((c - a)[None])
    )


def test_mt_hits_unit_triangle():
    tri = make_tri([0, 0, 5], [1, 0, 5], [0, 1, 5])
    o = jnp.array([[0.25, 0.25, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, valid = moller_trumbore(o, d, tri, jnp.inf)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 5.0, rtol=1e-6)


def test_mt_miss_outside_barycentric():
    tri = make_tri([0, 0, 5], [1, 0, 5], [0, 1, 5])
    o = jnp.array([[0.9, 0.9, 0.0]])  # u + v > 1
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, valid = moller_trumbore(o, d, tri, jnp.inf)
    assert not bool(valid[0])
    assert np.isinf(float(t[0]))


def test_mt_respects_tmax_and_behind():
    tri = make_tri([0, 0, 5], [1, 0, 5], [0, 1, 5])
    o = jnp.array([[0.25, 0.25, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    _, valid = moller_trumbore(o, d, tri, 4.0)  # t=5 >= t_max=4
    assert not bool(valid[0])
    _, valid = moller_trumbore(o, -d, tri, jnp.inf)  # behind the origin
    assert not bool(valid[0])


def test_mt_degenerate_triangle_misses():
    tri = TriangleSoA(
        v0=jnp.zeros((1, 3)), e1=jnp.zeros((1, 3)), e2=jnp.zeros((1, 3))
    )
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, valid = moller_trumbore(o, d, tri, jnp.inf)
    assert not bool(valid[0])
    assert np.isfinite(np.asarray(t)).sum() == 0


def test_mt_unnormalized_direction_scales_t():
    # The reference traces unnormalized primary rays (main.rs:326-330): t
    # must be in direction-length units.
    tri = make_tri([-1, -1, 4], [3, -1, 4], [-1, 3, 4])
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, 2.0]])
    t, valid = moller_trumbore(o, d, tri, jnp.inf)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)


def test_mt_random_vs_numpy_oracle(rng):
    n = 256
    v = rng.normal(size=(n, 3, 3)).astype(np.float32)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    tri = TriangleSoA(
        v0=jnp.asarray(v[:, 0]),
        e1=jnp.asarray(v[:, 1] - v[:, 0]),
        e2=jnp.asarray(v[:, 2] - v[:, 0]),
    )
    t, valid = moller_trumbore(jnp.asarray(o), jnp.asarray(d), tri, jnp.inf)

    # numpy oracle, scalar formulation
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    p = np.cross(d, e2)
    det = np.einsum("ij,ij->i", e1, p)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        s = o - v[:, 0]
        u = np.einsum("ij,ij->i", s, p) * inv
        q = np.cross(s, e1)
        vv = np.einsum("ij,ij->i", d, q) * inv
        tt = np.einsum("ij,ij->i", e2, q) * inv
    ok = (np.abs(det) >= 1e-8) & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt > 1e-8)
    np.testing.assert_array_equal(np.asarray(valid), ok)
    np.testing.assert_allclose(np.asarray(t)[ok], tt[ok], rtol=2e-5)


def test_slab_basic():
    # The reference's only numeric test (objects.rs:335-354): axis ray vs
    # unit cube.
    o = jnp.array([[0.0, 2.0, 0.0]])
    inv_d = 1.0 / jnp.array([[1e-20, -1.0, 1e-20]])
    hit = slab_test(o, inv_d, jnp.array([-0.5, -0.5, -0.5]),
                    jnp.array([0.5, 0.5, 0.5]), jnp.inf)
    assert bool(hit[0])


def test_slab_miss_and_behind():
    bmin = jnp.array([-1.0, -1.0, 4.0])
    bmax = jnp.array([1.0, 1.0, 6.0])
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 10.0], [5.0, 0.0, 0.0]])
    d = np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]], dtype=np.float32)
    inv_d = jnp.asarray(1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d))
    hit = slab_test(o, inv_d, bmin, bmax, jnp.inf)
    assert list(np.asarray(hit)) == [True, False, False]


def test_slab_respects_tmax():
    bmin = jnp.array([-1.0, -1.0, 4.0])
    bmax = jnp.array([1.0, 1.0, 6.0])
    o = jnp.zeros((1, 3))
    inv_d = jnp.asarray(1.0 / np.array([[1e-20, 1e-20, 1.0]], dtype=np.float32))
    assert not bool(slab_test(o, inv_d, bmin, bmax, 3.0)[0])
    assert bool(slab_test(o, inv_d, bmin, bmax, 5.0)[0])


def test_ray_sphere():
    # Parity with the reference's (unused) Sphere::ray_hits, objects.rs:247-271.
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, valid = ray_sphere(o, d, jnp.array([0.0, 0.0, 5.0]), 1.0, jnp.inf)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-6)
    _, valid = ray_sphere(o, -d, jnp.array([0.0, 0.0, 5.0]), 1.0, jnp.inf)
    assert not bool(valid[0])


def test_reflect():
    d = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(reflect(d, n)), [[1.0, 1.0, 0.0]],
                               atol=1e-7)


def test_triangle_normal_matches_winding():
    n = triangle_normal(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 1.0, 0.0])
    )
    np.testing.assert_allclose(np.asarray(n), [0.0, 0.0, 1.0], atol=1e-7)
