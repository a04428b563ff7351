"""ctypes bindings for the native C++ batch loader (native/loader.cpp).

Builds the shared library on first use (g++ is baked into the image; no
pybind11 — plain C ABI). Falls back cleanly when a compiler isn't available:
callers use `available()` and keep the PIL/numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "loader.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libiatpu_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    global _build_failed
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB, "-lpng", "-lz", "-lpthread"],
            check=True, capture_output=True,
        )
        return True
    except Exception as e:  # pragma: no cover - environment dependent
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        lib.iatpu_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.iatpu_decode_png.restype = ctypes.c_int
        lib.iatpu_decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.iatpu_decode_png_batch.restype = ctypes.c_int
        lib.iatpu_load_npy_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ]
        lib.iatpu_load_npy_f32.restype = ctypes.c_int
        lib.iatpu_load_npy_f32_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ]
        lib.iatpu_load_npy_f32_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_png_batch(paths: List[str], h: int, w: int, c: int = 3, threads: int = 8) -> np.ndarray:
    """Parallel PNG decode -> [N, h, w, c] uint8."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    n = len(paths)
    out = np.empty((n, h, w, c), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ret = lib.iatpu_decode_png_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, c, threads
    )
    if ret != 0:
        raise IOError(f"native PNG batch decode failed ({ret}) for {paths[:2]}...")
    return out


def load_npy_f32(path: str, max_elems: int = 1 << 26) -> np.ndarray:
    lib = _load()
    assert lib is not None
    buf = np.empty(max_elems, np.float32)
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    ret = lib.iatpu_load_npy_f32(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems, shape, ctypes.byref(ndim),
    )
    if ret != 0:
        raise IOError(f"native npy load failed ({ret}): {path}")
    shp = tuple(shape[i] for i in range(ndim.value))
    total = int(np.prod(shp)) if shp else 1
    return buf[:total].reshape(shp).copy()


def load_npy_f32_batch(paths: List[str], item_shape, threads: int = 8) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = len(paths)
    elems = int(np.prod(item_shape))
    out = np.empty((n,) + tuple(item_shape), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ret = lib.iatpu_load_npy_f32_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), elems, threads
    )
    if ret != 0:
        raise IOError(f"native npy batch load failed ({ret})")
    return out
