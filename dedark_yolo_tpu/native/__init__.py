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

_SRC = Path(__file__).parent / "letterbox.cc"
_LIB_CACHE = Path(tempfile.gettempdir()) / "dedark_native"
_lib = None
_tried = False


def _build():
    _LIB_CACHE.mkdir(parents=True, exist_ok=True)
    so = _LIB_CACHE / "libdedark_native.so"
    if not so.is_file() or so.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(so), str(_SRC), "-lpthread"],
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
