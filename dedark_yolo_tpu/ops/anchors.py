"""Anchor-free grid anchors and DFL box decoding.

On TPU, anchors are static config derived from (imgsz, strides) — computed once at
trace time, never re-made per shape (reference re-makes them when shape changes:
ultralytics/nn/modules/head.py:66-73).

Reference formulas: ultralytics/utils/tal.py:246-277 (make_anchors/dist2bbox/bbox2dist),
ultralytics/nn/modules/block.py:220-239 (DFL integral decode).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_anchors(feat_shapes, strides, grid_cell_offset=0.5, dtype=np.float32):
    """Grid anchor centers for a list of feature shapes [(h, w), ...].

    Returns:
        anchor_points: (sum(h*w), 2) in grid units (x, y), offset by 0.5.
        stride_tensor: (sum(h*w), 1).
    Anchor order matches the reference: row-major per level, levels in input order.
    """
    points, stride_list = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = np.arange(w, dtype=dtype) + grid_cell_offset
        sy = np.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        points.append(np.stack([gx, gy], -1).reshape(-1, 2))
        stride_list.append(np.full((h * w, 1), s, dtype=dtype))
    return jnp.asarray(np.concatenate(points)), jnp.asarray(np.concatenate(stride_list))


def dist2bbox(distance, anchor_points, xywh=True, axis=-1):
    """ltrb distances -> boxes around anchor points. Reference tal.py:262-271."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max):
    """xyxy boxes -> ltrb distances, clamped to [0, reg_max-0.01]. Reference tal.py:274-277."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def dfl_decode(pred_dist, reg_max=16):
    """Distribution Focal Loss integral decode.

    pred_dist: (..., 4*reg_max) raw logits -> (..., 4) expected distances via
    softmax(reg_max bins) . arange(reg_max). Reference block.py:235-239 — their
    layout is (b, 4*reg_max, a) viewed as (b, 4, reg_max, a); ours is channel-last
    with the same (4, reg_max) bin grouping.
    """
    import jax
    shape = pred_dist.shape[:-1]
    x = pred_dist.reshape(*shape, 4, reg_max).astype(jnp.float32)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return jax.nn.softmax(x, axis=-1) @ proj
