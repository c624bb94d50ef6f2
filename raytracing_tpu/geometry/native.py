"""ctypes bindings to the native C++ host runtime (csrc/raytracing_native.cpp).

The reference's host-side hot paths are native Rust (OBJ parse, locality
sort, packet build — src/main.rs:38-72, src/opt.rs). Ours are native C++,
loaded lazily; every entry point has a numpy fallback so the framework works
without the toolchain. Build with `make -C csrc` (see csrc/Makefile).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "libraytracing_native.so",
)
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rt_parse_obj_count.restype = ctypes.c_int
        lib.rt_parse_obj_count.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.rt_parse_obj_fill.restype = ctypes.c_int
        lib.rt_parse_obj_fill.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_long,
        ]
        lib.rt_morton_order.restype = ctypes.c_int
        lib.rt_morton_order.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # centroids [T,3]
            ctypes.c_long,  # T
            ctypes.POINTER(ctypes.c_int),  # out order [T]
        ]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def parse_obj(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_long(0)
    nt = ctypes.c_long(0)
    if lib.rt_parse_obj_count(path.encode(), ctypes.byref(nv), ctypes.byref(nt)) != 0:
        return None
    verts = np.empty((nv.value, 3), dtype=np.float32)
    tris = np.empty((nt.value, 3), dtype=np.int32)
    rc = lib.rt_parse_obj_fill(
        path.encode(),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nv.value,
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nt.value,
    )
    if rc != 0:
        return None
    return verts, tris


def morton_order(centroids: np.ndarray) -> Optional[np.ndarray]:
    """Spatial (Morton/Z-curve) sort order of triangle centroids [T,3]."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(centroids, dtype=np.float32)
    out = np.empty(c.shape[0], dtype=np.int32)
    rc = lib.rt_morton_order(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out if rc == 0 else None
