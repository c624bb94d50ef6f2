"""Tests for the app shell, checkpointing, profiling, and image output."""

import json
import os

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracing_tpu.app import build_parser, cmd_render
from raytracing_tpu.utils import checkpoint as ckpt
from raytracing_tpu.utils.image import _write_png_raw, write_png
from raytracing_tpu.utils.profiling import RateMeter, device_summary, timed


def test_checkpoint_roundtrip(tmp_path):
    params = {"verts": jnp.ones((5, 3)), "colors": jnp.zeros((2, 3))}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, params, state, step=7, metadata={"note": "x"})
    p2, s2, step, meta = ckpt.load(path, params, state)
    assert step == 7 and meta["note"] == "x"
    np.testing.assert_array_equal(np.asarray(p2["verts"]),
                                  np.asarray(params["verts"]))
    # optimizer state leaves restored too
    l1 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(s2)]
    l0 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(state)]
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_shape_mismatch(tmp_path):
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, {"v": jnp.ones((3,))})
    with pytest.raises(ValueError):
        ckpt.load(path, {"v": jnp.ones((4,))})


def test_rate_meter():
    m = RateMeter("x", interval=0.0)
    out = []
    r = m.tick(10, emit=lambda s: out.append(s))
    assert r is not None and out and out[0].startswith("x:")


def test_timed_and_device_summary():
    with timed("op", sync=True) as t:
        _ = jnp.ones((8, 8)).sum()
    assert t["seconds"] >= 0
    assert "cpu" in device_summary()


def test_png_raw_writer(tmp_path):
    img = np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(np.float32)
    rgba = np.dstack([(img * 255).astype(np.uint8),
                      np.full((16, 16, 1), 255, np.uint8)])
    p = str(tmp_path / "x.png")
    _write_png_raw(p, rgba)
    from PIL import Image

    back = np.asarray(Image.open(p))
    assert back.shape == (16, 16, 4)
    np.testing.assert_array_equal(back, rgba)


def test_cli_render_small(tmp_path):
    out = str(tmp_path / "f.png")
    args = build_parser().parse_args(
        ["render", "--width", "24", "--height", "24", "--spp", "1",
         "--backend", "cluster", "--chunk-size", "576", "--out", out]
    )
    args.fn(args)
    assert os.path.exists(out)


def test_cli_fit_with_checkpoint(tmp_path):
    ck = str(tmp_path / "fit.npz")
    args = build_parser().parse_args(
        ["fit", "--width", "12", "--height", "12", "--spp", "1",
         "--backend", "cluster", "--chunk-size", "144", "--steps", "5",
         "--rays-per-step", "32", "--diffuse-depth", "1",
         "--reflect-depth", "1", "--checkpoint", ck]
    )
    args.fn(args)
    assert os.path.exists(ck)


def test_accel_save_load_roundtrip(tmp_path):
    """Serialized accels must rebuild the exact structure (production
    serving builds once and ships the .npz with the scene)."""
    import numpy as np
    import pytest

    from raytracing_tpu.accel.packets import (
        build_cluster_accel, load_accel, save_accel,
    )
    from raytracing_tpu.geometry.scene import build_default_scene

    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    p = str(tmp_path / "accel.npz")
    save_accel(p, accel)
    back = load_accel(p)
    for name in accel._fields:
        a, b = getattr(accel, name), getattr(back, name)
        if a is None:
            assert b is None, name
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
    # version gate
    import numpy as _np
    bad = {"_version": _np.int64(999)}
    _np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(ValueError):
        load_accel(str(tmp_path / "bad.npz"))


def test_accel_cache_rejects_wrong_mesh(tmp_path):
    """A cache built from different geometry must raise, not silently
    render the wrong scene (and a foreign npz must fail the format gate
    with ValueError, not KeyError)."""
    import numpy as np
    import pytest

    from raytracing_tpu.accel.packets import (
        build_cluster_accel, load_accel, save_accel,
    )
    from raytracing_tpu.geometry.scene import build_default_scene

    scene = build_default_scene(t=0.0)
    accel = build_cluster_accel(scene.mesh, cluster_size=16)
    p = str(tmp_path / "accel.npz")
    save_accel(p, accel, mesh=scene.mesh)
    # same mesh: fine; also validates cluster_size
    load_accel(p, mesh=scene.mesh, cluster_size=16)
    with pytest.raises(ValueError):
        load_accel(p, mesh=scene.mesh, cluster_size=64)
    moved = scene.mesh._replace(verts=scene.mesh.verts + 0.5)
    with pytest.raises(ValueError):
        load_accel(p, mesh=moved)
    # foreign npz: clear format error
    np.savez(str(tmp_path / "foreign.npz"), something=np.arange(3))
    with pytest.raises(ValueError):
        load_accel(str(tmp_path / "foreign.npz"))
