"""Box geometry ops as pure JAX functions.

Formula parity with the reference:
  - format converters: ultralytics/utils/ops.py:357-515
  - bbox_iou / CIoU / GIoU / DIoU: ultralytics/utils/metrics.py:75-128
  - scale_boxes (letterbox inverse): ultralytics/utils/ops.py:95-125

Everything is elementwise/broadcast math so XLA fuses it into neighbouring ops.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Reference ops.py:386-403."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Reference ops.py:366-383."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def ltwh2xyxy(x):
    """(left, top, w, h) -> xyxy. Reference ops.py:457-470."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l, t, l + w, t + h], axis=-1)


def xyxy2ltwh(x):
    """xyxy -> (left, top, w, h). Reference ops.py:473-489."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w). Reference ops.py:281-301."""
    h, w = shape[0], shape[1]
    x1 = jnp.clip(boxes[..., 0:1], 0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding=True):
    """Rescale xyxy boxes from letterboxed `img1_shape` back to `img0_shape`.

    Reference: ultralytics/utils/ops.py:95-125 (incl. the round(x - 0.1) pad quirk).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
               round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1))
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    if padding:
        boxes = boxes - jnp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Rescale (..., 2+) point coordinates (e.g. keypoints x,y[,v]) from the
    letterboxed `img1_shape` frame back to native `img0_shape`.

    Reference: ultralytics/utils/ops.py scale_coords (:699-737) — same
    gain/pad derivation as scale_boxes, applied to x/y columns only; any
    extra columns (keypoint visibility) pass through untouched.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    x = jnp.clip((coords[..., 0:1] - pad[0]) / gain, 0, img0_shape[1])
    y = jnp.clip((coords[..., 1:2] - pad[1]) / gain, 0, img0_shape[0])
    return jnp.concatenate([x, y, coords[..., 2:]], axis=-1)


def bbox_iou(box1, box2, xywh=True, GIoU=False, DIoU=False, CIoU=False, eps=1e-7):
    """Elementwise IoU between broadcastable box arrays (last dim 4).

    Formula parity with reference metrics.py:75-128, including the eps placement on
    h1/h2 in the xyxy branch and the stop-gradient alpha in the CIoU v-term.
    """
    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        b1_x1, b1_x2 = x1 - w1 / 2, x1 + w1 / 2
        b1_y1, b1_y2 = y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2 = x2 - w2 / 2, x2 + w2 / 2
        b2_y1, b2_y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) *
             jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw ** 2 + ch ** 2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 +
                    (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                import jax
                v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def box_iou_matrix(box1, box2, eps=1e-7):
    """Pairwise IoU matrix between xyxy boxes: (N,4) x (M,4) -> (N,M).

    Reference: ultralytics/utils/metrics.py:52-72 (box_iou).
    """
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area1[:, None] + area2[None, :] - inter + eps)
