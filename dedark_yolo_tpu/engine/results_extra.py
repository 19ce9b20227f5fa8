"""Masks/Keypoints result containers (reference engine/results.py:457,521).

Returned by segment/pose predictors; numpy-backed like Boxes."""

from __future__ import annotations

import numpy as np

from .results import NumpyTensorAPI


class Masks(NumpyTensorAPI):
    """(n, mh, mw) binary instance masks in proto space + orig shape scaling."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xyn(self):
        """Per-instance contours normalized to [0, 1] (reference
        results.py:494-500)."""
        h, w = self.orig_shape
        return [c / np.asarray([w, h], np.float32) for c in self.xy]

    @property
    def segments(self):
        """Deprecated alias of xyn (reference results.py:486-492)."""
        from ..utils import LOGGER
        LOGGER.warning("'Masks.segments' is deprecated — use 'Masks.xyn' "
                       "(normalized) or 'Masks.xy' (pixels)")
        return self.xyn

    @property
    def xy(self):
        """Per-instance mask contours in original-image pixels."""
        import cv2
        h, w = self.orig_shape
        mh, mw = self.data.shape[1:]
        out = []
        for m in self.data.astype(np.uint8):
            cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if cs:
                c = max(cs, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
                c[:, 0] *= w / mw
                c[:, 1] *= h / mh
                out.append(c)
            else:
                out.append(np.zeros((0, 2), np.float32))
        return out


class Probs:
    """(nc,) classification probabilities (reference results.py:569)."""

    def __init__(self, data: np.ndarray, names=None):
        self.data = np.asarray(data).reshape(-1)
        self.names = names or {}

    # identity device-move shims (host numpy; see NumpyTensorAPI)
    def cpu(self):
        return self

    def numpy(self):
        return self

    def to(self, *args, **kwargs):
        return self

    @property
    def top1(self):
        return int(np.argmax(self.data))

    @property
    def top1conf(self):
        return float(self.data[self.top1])

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top5conf(self):
        return self.data[self.top5]


class Keypoints(NumpyTensorAPI):
    """(n, nk, 3) keypoints [x, y, visibility] in original-image pixels."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None
