"""Fixed-shape batched NMS for TPU.

Replaces the reference's per-image Python loop + torchvision.ops.nms native kernel
(ultralytics/utils/ops.py:144-278) with a static-shape XLA program:

  1. candidate gating: multi-label (anchor, class) pairs above conf_thres are
     selected with one top-k over the flattened score matrix (replaces the ragged
     boolean indexing of ops.py:219,236-238; `max_nms` caps candidates like
     ops.py:255-256's 30000 cap);
  2. per-class separation via the class-offset trick (ops.py:259-261);
  3. greedy suppression as a `lax.fori_loop` of max_det steps, each step a fully
     vectorized argmax + IoU-mask over all candidates (O(max_det * max_nms) work,
     no NxN IoU matrix in memory);
  4. fixed (B, max_det, 6) output [x1, y1, x2, y2, conf, cls] + valid counts —
     nothing re-traces across batches.

vmapped over the batch; everything is data-independent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _nms_single(boxes, scores, iou_thres, max_det):
    """Greedy NMS for one image.

    boxes: (N, 4) xyxy already class-offset. scores: (N,), 0 for invalid candidates.
    Returns (keep_idx (max_det,), keep_scores (max_det,)); invalid slots are -1 / 0.
    """
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    def cond(state):
        # early exit: stop as soon as no candidate remains above zero — typical
        # scenes have far fewer than max_det objects, so this cuts the
        # sequential-iteration latency to the actual detection count
        i, live_scores, _, _ = state
        return jnp.logical_and(i < max_det, jnp.max(live_scores) > 0.0)

    def body(state):
        i, live_scores, keep_idx, keep_scores = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        bb = boxes[best]
        iw = jnp.clip(jnp.minimum(x2, bb[2]) - jnp.maximum(x1, bb[0]), 0, None)
        ih = jnp.clip(jnp.minimum(y2, bb[3]) - jnp.maximum(y1, bb[1]), 0, None)
        inter = iw * ih
        barea = jnp.clip(bb[2] - bb[0], 0, None) * jnp.clip(bb[3] - bb[1], 0, None)
        iou = inter / (areas + barea - inter + 1e-7)
        # suppress overlaps (incl. the selected box itself, IoU=1)
        live_scores = jnp.where(iou > iou_thres, 0.0, live_scores)
        live_scores = live_scores.at[best].set(0.0)
        keep_idx = keep_idx.at[i].set(best)
        keep_scores = keep_scores.at[i].set(best_score)
        return i + 1, live_scores, keep_idx, keep_scores

    init = (jnp.int32(0), scores,
            jnp.full((max_det,), -1, dtype=jnp.int32),
            jnp.zeros((max_det,), dtype=scores.dtype))
    _, _, keep_idx, keep_scores = jax.lax.while_loop(cond, body, init)
    return keep_idx, keep_scores


@functools.partial(jax.jit, static_argnames=(
    "conf_thres", "iou_thres", "max_det", "max_nms", "multi_label", "agnostic",
    "max_wh", "return_idx"))
def non_max_suppression(boxes_xywh, class_scores, conf_thres=0.25, iou_thres=0.45,
                        max_det=300, max_nms=2048, multi_label=True, agnostic=False,
                        max_wh=7680.0, class_mask=None, return_idx=False):
    """Batched fixed-shape NMS.

    Args:
        boxes_xywh:   (B, N, 4) decoded boxes in pixels (cx, cy, w, h).
        class_scores: (B, N, nc) sigmoid class probabilities.
        class_mask:   optional (nc,) 0/1 mask to filter classes (ops.py:244-245).
        return_idx:   also return the ORIGINAL anchor index of every kept
                      detection (B, max_det) int32, -1 for invalid slots — lets
                      segment/pose gather per-anchor mask coefficients and
                      keypoints exactly (the reference keeps extra columns
                      through NMS instead, ops.py:234-276).

    Returns:
        dets:   (B, max_det, 6) [x1, y1, x2, y2, conf, cls]; invalid rows have
                conf == 0 and cls == -1.
        counts: (B,) number of valid detections per image.
        [idx:   (B, max_det) int32 anchor indices, when return_idx.]
    """
    b, n, nc = class_scores.shape
    scores = class_scores
    if class_mask is not None:
        scores = scores * class_mask[None, None, :]

    if multi_label and nc > 1:
        flat = scores.reshape(b, n * nc)
        flat = jnp.where(flat > conf_thres, flat, 0.0)
        k = min(max_nms, n * nc)
        cand_scores, flat_idx = jax.lax.top_k(flat, k)  # (B, k)
        anchor_idx = flat_idx // nc
        cls_idx = (flat_idx % nc).astype(jnp.float32)
    else:
        conf = jnp.max(scores, axis=-1)  # (B, N)
        cls_idx_full = jnp.argmax(scores, axis=-1).astype(jnp.float32)
        conf = jnp.where(conf > conf_thres, conf, 0.0)
        k = min(max_nms, n)
        cand_scores, anchor_idx = jax.lax.top_k(conf, k)
        cls_idx = jnp.take_along_axis(cls_idx_full, anchor_idx, axis=1)

    cand_boxes = jnp.take_along_axis(boxes_xywh, anchor_idx[..., None], axis=1)
    cx, cy, w, h = jnp.split(cand_boxes, 4, axis=-1)
    xyxy = jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)

    offset = 0.0 if agnostic else max_wh
    shifted = xyxy + (cls_idx * offset)[..., None]

    keep_idx, keep_scores = jax.vmap(
        lambda bx, sc: _nms_single(bx, sc, iou_thres, max_det))(shifted, cand_scores)

    gather = jnp.clip(keep_idx, 0, None)
    out_boxes = jnp.take_along_axis(xyxy, gather[..., None], axis=1)
    out_cls = jnp.take_along_axis(cls_idx, gather, axis=1)
    valid = keep_idx >= 0
    out_cls = jnp.where(valid, out_cls, -1.0)
    out_boxes = jnp.where(valid[..., None], out_boxes, 0.0)
    dets = jnp.concatenate(
        [out_boxes, keep_scores[..., None], out_cls[..., None]], axis=-1)
    counts = jnp.sum(valid, axis=-1)
    if return_idx:
        out_anchor = jnp.take_along_axis(anchor_idx, gather, axis=1)
        out_anchor = jnp.where(valid, out_anchor, -1).astype(jnp.int32)
        return dets, counts, out_anchor
    return dets, counts
