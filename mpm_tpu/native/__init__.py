"""ctypes loader for the native frame-IO library (see frameio.cpp).

Builds on demand with `make` if a toolchain is present; all callers fall
back to the pure-Python implementations in mpm_tpu/render/image.py when the
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libframeio.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.frameio_encode_png.restype = ctypes.c_int
    lib.frameio_encode_png.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.frameio_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.frameio_tonemap_u8.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.frameio_write_blob.restype = ctypes.c_int
    lib.frameio_write_blob.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.frameio_read_blob.restype = ctypes.c_int
    lib.frameio_read_blob.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def encode_png(img_u8: np.ndarray, compress_level: int = 1) -> bytes | None:
    """RGB8 [H, W, 3] -> PNG bytes, or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img_u8.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.frameio_encode_png(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
        compress_level,
        ctypes.byref(out),
        ctypes.byref(out_len),
    )
    if rc != 0:
        return None
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.frameio_free(out)


def tonemap_u8(img_f32: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    img_f32 = np.ascontiguousarray(img_f32, np.float32)
    out = np.empty(img_f32.shape, np.uint8)
    lib.frameio_tonemap_u8(
        img_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img_f32.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def write_blob(path: str, arr: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr, np.float32)
    rc = lib.frameio_write_blob(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), arr.size
    )
    return rc == 0


def read_blob(path: str, shape, dtype=np.float32) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(shape, np.float32)
    rc = lib.frameio_read_blob(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
    )
    return out if rc == 0 else None
