"""Tests of sampling (tangent frames, cosine hemisphere) and color ops."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.ops.color import gamma_correct, to_rgba_frame, to_u8
from raytracing_tpu.ops.sampling import (
    cosine_hemisphere,
    stratified_offsets,
    tangent_frame,
)


def test_tangent_frame_orthonormal(rng):
    n = rng.normal(size=(128, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n)
    t1, t2 = tangent_frame(n)
    for v in (t1, t2):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-5
        )
    np.testing.assert_allclose(np.sum(np.asarray(t1) * np.asarray(n), -1), 0,
                               atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(t2) * np.asarray(n), -1), 0,
                               atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(t1) * np.asarray(t2), -1), 0,
                               atol=1e-5)


def test_tangent_frame_z_aligned_normal():
    # n // z picks X as the arbitrary axis (main.rs:74-86); n in the xy
    # plane picks Z.
    for n in ([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]):
        t1, t2 = tangent_frame(jnp.array(n))
        assert np.all(np.isfinite(np.asarray(t1)))
        assert np.all(np.isfinite(np.asarray(t2)))


def test_cosine_hemisphere_distribution():
    n = jnp.array([[0.0, 1.0, 0.0]])
    d = cosine_hemisphere(jax.random.PRNGKey(0), n, shape=(4096,))
    d = np.asarray(d).reshape(-1, 3)
    cos = d[:, 1]
    assert (cos >= -1e-6).all()  # upper hemisphere
    # E[cos theta] for pdf cos/pi is 2/3.
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=0.02)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_stratified_offsets_match_reference_pattern():
    offs = np.asarray(stratified_offsets(4))
    want = {(0.25, 0.25), (0.75, 0.75), (0.25, 0.75), (0.75, 0.25)}
    got = {tuple(np.round(o, 6)) for o in offs}
    assert got == want  # main.rs:321-364 sample positions


def test_gamma_and_u8():
    rgb = jnp.array([[0.0, 0.25, 4.0]])
    g = np.asarray(gamma_correct(rgb, 2.2))
    np.testing.assert_allclose(g[0, 1], 0.25 ** (1 / 2.2), rtol=1e-5)
    u = np.asarray(to_u8(jnp.array([[0.5, 1.5, -0.1]])))
    assert u[0, 1] == 255  # clamp at 255 (ScreenColor::from, objects.rs:90-98)
    frame = to_rgba_frame(jnp.ones((2, 2, 3)) * 0.5)
    assert frame.shape == (2, 2, 4)
    assert (frame[..., 3] == 0xFF).all()


def test_nonsquare_spp_offsets():
    # Any spp stratifies on a gx x gy grid (gx * gy == spp); offsets stay
    # inside the pixel and cover distinct cells.
    import numpy as np
    from raytracing_tpu.ops.sampling import stratified_grid, stratified_offsets

    for spp in (1, 2, 3, 6, 8, 12):
        gx, gy = stratified_grid(spp)
        assert gx * gy == spp
        offs = np.asarray(stratified_offsets(spp))
        assert offs.shape == (spp, 2)
        assert (offs > 0).all() and (offs < 1).all()
        assert len({tuple(o) for o in offs.tolist()}) == spp
