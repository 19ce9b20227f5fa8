"""Detection heads with in-graph DFL decode.

Reference: ultralytics/nn/modules/head.py:19-102 (Detect), 105-174 (AsffDetect).

TPU design differences:
  - anchors/strides are static, computed once from (imgsz, strides) at trace time
    (the reference re-makes them whenever the input shape changes, head.py:66-73);
  - layout is NHWC; the decoded output is channel-last (B, sum(hw), 4 + nc)
    [xywh in pixels, sigmoid class scores] vs the reference's (B, 4+nc, sum(hw));
  - train and eval paths are both pure functions of the inputs — the head always
    returns the raw per-level maps, and `decode` is a separate jittable function so
    the validator can run loss + decode from one forward.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import make_anchors, dist2bbox, dfl_decode
from .layers import Conv, Conv2d


class Detect(nn.Module):
    """YOLOv8 detect head: per-level box (4*reg_max ch) + cls (nc ch) branches.

    Branch widths: c2 = max(16, ch0//4, reg_max*4), c3 = max(ch0, min(nc, 100))
    (reference head.py:38). Bias init mirrors head.py:95-102: box bias 1.0, cls
    bias log(5 / nc / (640/stride)^2).
    """
    nc: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        ch0 = xs[0].shape[-1]
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(self.nc, 100))
        outs = []
        for i, (x, s) in enumerate(zip(xs, self.strides)):
            box = Conv(c2, 3, name=f"cv2_{i}_0")(x, train)
            box = Conv(c2, 3, name=f"cv2_{i}_1")(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True,
                          bias_init=nn.initializers.constant(1.0),
                          name=f"cv2_{i}_2")(box)
            cls = Conv(c3, 3, name=f"cv3_{i}_0")(x, train)
            cls = Conv(c3, 3, name=f"cv3_{i}_1")(cls, train)
            cls_bias = math.log(5 / self.nc / (640 / s) ** 2)
            cls = nn.Conv(self.nc, (1, 1), use_bias=True,
                          bias_init=nn.initializers.constant(cls_bias),
                          name=f"cv3_{i}_2")(cls)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


class AsffDetect(nn.Module):
    """Detect variant with single 1x1 convs per branch (reference head.py:105-174)."""
    nc: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        for i, (x, s) in enumerate(zip(xs, self.strides)):
            box = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True,
                          bias_init=nn.initializers.constant(1.0),
                          name=f"cv2_{i}")(x)
            cls_bias = math.log(5 / self.nc / (640 / s) ** 2)
            cls = nn.Conv(self.nc, (1, 1), use_bias=True,
                          bias_init=nn.initializers.constant(cls_bias),
                          name=f"cv3_{i}")(x)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


def flatten_raw(raw_maps: Sequence[jnp.ndarray]):
    """Per-level (B, H, W, no) maps -> (B, sum(hw), no), anchor order matching the
    reference's view+cat (head.py:74)."""
    b = raw_maps[0].shape[0]
    return jnp.concatenate(
        [m.reshape(b, -1, m.shape[-1]) for m in raw_maps], axis=1)


def decode_detections(raw_maps: Sequence[jnp.ndarray], nc: int,
                      strides: Sequence[int], reg_max: int = 16):
    """DFL-decode raw maps into (boxes_xywh_pixels (B,N,4), class_scores (B,N,nc)).

    Mirrors head.py:74-93: concat levels, split box/cls, DFL integral, dist2bbox
    around static grid anchors, scale by stride, sigmoid the class logits.
    """
    feat_shapes = [(m.shape[1], m.shape[2]) for m in raw_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    x = flatten_raw(raw_maps)
    box, cls = x[..., :4 * reg_max], x[..., 4 * reg_max:]
    dist = dfl_decode(box, reg_max)                     # (B, N, 4)
    dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
    return dbox, jax.nn.sigmoid(cls)
