"""Robust cv2 IO (reference utils/patches.py).

cv2.imread/imwrite fail silently on non-ASCII paths on some platforms
because they take char* filenames; the reference monkey-patches cv2
module-wide. Here the robust variants are explicit functions — callers that
read user-supplied paths use them, and nothing global is mutated.
"""

from __future__ import annotations

import numpy as np


def imread(filename, flags=None):
    """cv2.imread that survives non-ASCII paths (np.fromfile + imdecode)."""
    import cv2
    if flags is None:
        flags = cv2.IMREAD_COLOR
    try:
        img = cv2.imread(str(filename), flags)
        if img is not None:
            return img
    except cv2.error:
        pass
    try:
        return cv2.imdecode(np.fromfile(str(filename), np.uint8), flags)
    except Exception:
        return None


def imwrite(filename, img, params=None):
    """cv2.imwrite via imencode+tofile (non-ASCII-safe); returns success."""
    import cv2
    from pathlib import Path
    try:
        ok, buf = cv2.imencode(Path(str(filename)).suffix, img,
                               params or [])
        if ok:
            buf.tofile(str(filename))
        return bool(ok)
    except Exception:
        return False
