"""In-graph letterbox: ratio-preserving resize + 114-gray pad.

Reference: ultralytics/data/augment.py:540-605 (LetterBox) does this on the host
with cv2 per image. Here the resize+pad runs inside the jitted graph (device-side,
batched) for the inference path; the training augment pipeline has its own host-side
numpy letterbox (data/augment.py in this package) because it composes with mosaic.

Shapes are static: target (H, W) is a Python int pair at trace time; the per-image
scale/pad are data (computed from the original shape passed alongside the batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def letterbox_params(orig_hw, new_hw):
    """Compute (gain, pad_w, pad_h) like the reference (center padding).

    orig_hw / new_hw: (h, w) int tuples. Mirrors augment.py:552-577 with
    scaleup=True, center=True, stride auto-pad disabled (full target shape).
    """
    gain = min(new_hw[0] / orig_hw[0], new_hw[1] / orig_hw[1])
    unpad_w, unpad_h = round(orig_hw[1] * gain), round(orig_hw[0] * gain)
    pad_w = (new_hw[1] - unpad_w) / 2
    pad_h = (new_hw[0] - unpad_h) / 2
    return gain, pad_w, pad_h


def letterbox_jax(img, new_hw, pad_value=114.0 / 255.0):
    """Letterbox a single [0,1] HWC image to `new_hw` in-graph.

    Uses bilinear resize to the unpadded size then static pad. The unpadded size
    is a Python computation of the *static* input shape, so the graph stays fixed.
    """
    h, w = img.shape[0], img.shape[1]
    gain, pad_w, pad_h = letterbox_params((h, w), new_hw)
    unpad_h, unpad_w = round(h * gain), round(w * gain)
    resized = jax.image.resize(img, (unpad_h, unpad_w, img.shape[2]), method="bilinear")
    top, left = int(round(pad_h - 0.1)), int(round(pad_w - 0.1))
    bottom = new_hw[0] - unpad_h - top
    right = new_hw[1] - unpad_w - left
    return jnp.pad(resized, ((top, bottom), (left, right), (0, 0)),
                   constant_values=pad_value)
