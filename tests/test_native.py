"""Native C++ runtime parity tests (skipped when the library isn't built;
CI/driver builds it with `make -C csrc`)."""

import subprocess

import numpy as np
import pytest

from raytracing_tpu.geometry import native
from raytracing_tpu.geometry.obj import read_obj_numpy
from raytracing_tpu.geometry.scene import TEAPOT_OBJ


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native.available():
        try:
            subprocess.run(["make", "-C", "csrc"], check=True, cwd="/root/repo",
                           capture_output=True, timeout=120)
        except Exception:
            pass
        native._load_failed = False
        native._lib = None
    if not native.available():
        pytest.skip("native library unavailable")


def test_native_obj_matches_numpy():
    v_n, t_n = native.parse_obj(TEAPOT_OBJ)
    v_p, t_p = read_obj_numpy(TEAPOT_OBJ)
    np.testing.assert_allclose(v_n, v_p, rtol=1e-6)
    np.testing.assert_array_equal(t_n, t_p)


def test_native_obj_extensions(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"
        "f -4 -3 -2\n"
    )
    v_n, t_n = native.parse_obj(str(p))
    v_p, t_p = read_obj_numpy(str(p))
    np.testing.assert_allclose(v_n, v_p)
    np.testing.assert_array_equal(t_n, t_p)


def test_native_morton_matches_numpy(rng):
    from raytracing_tpu.accel.packets import _morton_codes

    pts = rng.normal(size=(4096, 3)).astype(np.float32)
    order_native = native.morton_order(pts)
    order_np = np.argsort(_morton_codes(pts), kind="stable")
    np.testing.assert_array_equal(order_native, order_np)
