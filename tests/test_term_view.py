"""Terminal live view (utils.term_view) — the headless window analog."""

import io

import numpy as np

from raytracing_tpu.utils.term_view import TermViewer, frame_to_ansi


def test_frame_to_ansi_shape_and_colors():
    img = np.zeros((4, 3, 3), dtype=np.float32)
    img[0:2] = [1.0, 0.0, 0.0]  # top two rows red
    img[2:4] = [0.0, 0.0, 1.0]  # bottom two rows blue
    s = frame_to_ansi(img)
    lines = s.split("\n")
    assert len(lines) == 2  # 4 pixel rows -> 2 text rows
    # text row 0 covers pixel rows 0/1 (red fg / red bg); text row 1
    # covers pixel rows 2/3 (blue fg / blue bg)
    assert "38;2;255;0;0" in lines[0] and "48;2;255;0;0" in lines[0]
    assert "38;2;0;0;255" in lines[1] and "48;2;0;0;255" in lines[1]
    assert lines[0].endswith("\x1b[0m")


def test_frame_to_ansi_downsamples_to_max_cols():
    img = np.random.default_rng(0).random((8, 64, 3)).astype(np.float32)
    s = frame_to_ansi(img, max_cols=16)
    first = s.split("\n")[0]
    assert first.count("▀") <= 16


def test_frame_to_ansi_accepts_uint8():
    img = np.full((2, 2, 3), 128, dtype=np.uint8)
    assert "38;2;128;128;128" in frame_to_ansi(img)


def test_viewer_homes_cursor_after_first_frame():
    buf = io.StringIO()
    v = TermViewer(max_cols=8, stream=buf)
    img = np.zeros((2, 2, 3), dtype=np.float32)
    v.show(img, status="f0")
    v.show(img, status="f1")
    out = buf.getvalue()
    assert out.count("\x1b[2J") == 1  # clear only once
    assert out.count("\x1b[H") == 2  # re-home every frame
    assert "f1" in out
