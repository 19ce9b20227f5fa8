"""Native (C++) host-runtime components, loaded via ctypes.

The reference's host-side image ops are native OpenCV called per image from
Python (GIL-serialized). This package builds a small C++ core once per machine
(g++ -O3 -shared) and calls it once per batch — the GIL is released inside the
ctypes call, so the thread pool scales with host cores.

Falls back gracefully when no compiler is available: `available()` returns False
and callers use the cv2/numpy path.
"""

from __future__ import annotations

import ctypes
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRCS = [Path(__file__).parent / "letterbox.cc",
         Path(__file__).parent / "decode.cc"]
_LIB_CACHE = Path(tempfile.gettempdir()) / "dedark_native"
_lib = None
_tried = False


def _build():
    _LIB_CACHE.mkdir(parents=True, exist_ok=True)
    so = _LIB_CACHE / "libdedark_native.so"
    newest_src = max(s.stat().st_mtime for s in _SRCS)
    if not so.is_file() or so.stat().st_mtime < newest_src:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(so)] + [str(s) for s in _SRCS] + ["-ljpeg", "-lpthread"],
            check=True, capture_output=True)
    return so


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        so = _build()
        lib = ctypes.CDLL(str(so))
        lib.letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),                 # srcs
            np.ctypeslib.ndpointer(np.int32, flags="C"),     # shapes
            ctypes.c_int32,                                  # n
            np.ctypeslib.ndpointer(np.uint8, flags="C"),     # dst
            ctypes.c_int32, ctypes.c_uint8, ctypes.c_int32,  # size, fill, swap
            ctypes.c_int32,                                  # n_threads
        ]
        lib.letterbox_batch.restype = None
        lib.decode_maxside_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int32,
        ]
        lib.decode_maxside_batch.restype = None
        lib.decode_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            ctypes.c_int32, ctypes.c_uint8,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int32,
        ]
        lib.decode_letterbox_batch.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def letterbox_batch(images, size, fill=114, swap_rb=True, n_threads=0):
    """Letterbox a list of HWC uint8 (BGR) images into one (N, size, size, 3)
    uint8 (RGB when swap_rb) batch using the native thread pool."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native letterbox unavailable (no compiler?)")
    n = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    shapes = np.asarray([[im.shape[0], im.shape[1]] for im in images],
                        dtype=np.int32)
    dst = np.empty((n, size, size, 3), np.uint8)
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in images])
    lib.letterbox_batch(ptrs, np.ascontiguousarray(shapes), n, dst,
                        size, fill, 1 if swap_rb else 0, n_threads)
    return dst


def _path_array(paths):
    enc = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * len(enc))(*enc)
    return arr, enc  # keep enc alive


def decode_maxside_batch(paths, size, bgr=True, n_threads=0):
    """Decode JPEGs at the cheapest DCT scale + max-side resize to `size`.

    Returns (imgs (N, size, size, 3) uint8 with each image top-left,
    shapes (N, 4) int32 [loaded_h, loaded_w, orig_h, orig_w]; zeros on a
    per-image decode failure)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decode unavailable (no compiler?)")
    n = len(paths)
    dst = np.empty((n, size, size, 3), np.uint8)
    shapes = np.zeros((n, 4), np.int32)
    arr, _keep = _path_array(paths)
    lib.decode_maxside_batch(arr, n, dst, size, 1 if bgr else 0, shapes,
                             n_threads)
    return dst, shapes


def decode_letterbox_batch(paths, size, fill=114, n_threads=0):
    """Decode JPEGs + letterbox to a device-ready (N, size, size, 3) RGB batch.

    Returns (batch, orig_shapes (N, 2) int32 [h0, w0]; zeros on failure)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decode unavailable (no compiler?)")
    n = len(paths)
    dst = np.empty((n, size, size, 3), np.uint8)
    shapes = np.zeros((n, 2), np.int32)
    arr, _keep = _path_array(paths)
    lib.decode_letterbox_batch(arr, n, dst, size, fill, shapes, n_threads)
    return dst, shapes
