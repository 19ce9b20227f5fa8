"""Low-light degradation synthesis (the reference's 'lowlight_maker').

Reference: img ** dark_param gamma-crush, applied on device during training
(ultralytics/models/yolo/detect/train.py:79,103) and offline in
ultralytics/utils/lowlight_process.py:10-96. A single pow — kept as its own
function so it shows up by name in traces and can be reused by the offline tool.
"""

from __future__ import annotations

import jax.numpy as jnp


def lowlight_degrade(img, dark_param):
    """Gamma-crush a [0,1] image batch: img ** dark_param.

    For integer exponents (the reference's defaults are ints like 5 or 15)
    the pow lowers to a square-and-multiply chain instead of per-element
    exp(y*log(x)) transcendentals over the full-resolution batch (same value
    to within float rounding; the transcendental form isn't bit-exact across
    backends either).
    """
    x = jnp.clip(img, 0.0, 1.0)
    p = float(dark_param)
    if p.is_integer() and 1 <= p <= 64:
        return x ** int(p)
    return jnp.power(x, dark_param)
