"""v8 detection loss + recovery loss, pure JAX with fixed shapes.

Reference: ultralytics/utils/loss.py:103-193 (v8DetectionLoss), 51-84 (BboxLoss +
_df_loss), 388-415 (RcoveryDetectionLoss).

Differences forced by fixed shapes (and nothing else):
  - targets arrive pre-padded per image as (B, max_boxes, 5) [cls, xywh normalized]
    with a validity mask, replacing the ragged preprocess loop (loss.py:124-139);
  - fg-masked reductions are masked sums instead of boolean indexing.

Loss semantics preserved exactly: BCE(cls) summed / target_scores_sum; CIoU box
loss weighted by assigned score sums; DFL cross-entropy on the two neighbouring
bins; gains box/cls/dfl from the config; total = loss.sum() * batch_size; the
recovery MSE is folded into the cls item with weight lrl and loss_items stays
shape [3] (loss.py:388-415).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.anchors import make_anchors, dist2bbox, bbox2dist, dfl_decode
from ..ops.boxes import bbox_iou, xywh2xyxy
from .tal import task_aligned_assign


class LossItems(NamedTuple):
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def _bce_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (reduction='none')."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _df_loss(pred_dist_logits, target, reg_max):
    """Distribution focal loss (reference loss.py:75-84).

    pred_dist_logits: (..., 4, reg_max); target: (..., 4) in [0, reg_max-1).
    Returns (..., 1): mean over the 4 sides.
    """
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist_logits, axis=-1)
    # one-hot contraction instead of take_along_axis: bit-identical (a single
    # nonzero term per row), but the TPU gather serializes in fwd AND lowers
    # to a scatter in bwd — 26.5 -> 1.7 ms fwd at train shapes, and the bwd
    # becomes a dense elementwise product (scripts/bench_loss.py)
    oh_l = jax.nn.one_hot(tl, reg_max, dtype=logp.dtype)
    oh_r = jax.nn.one_hot(jnp.clip(tr, 0, reg_max - 1), reg_max,
                          dtype=logp.dtype)
    ce_l = -jnp.sum(logp * oh_l, axis=-1)
    ce_r = -jnp.sum(logp * oh_r, axis=-1)
    return jnp.mean(ce_l * wl + ce_r * wr, axis=-1, keepdims=True)


def detection_loss(raw_maps: Sequence[jnp.ndarray], batch: dict, nc: int,
                   strides: Sequence[int], hyp: dict, reg_max: int = 16,
                   tal_topk: int = 10):
    """Compute (total_loss, LossItems) from raw head maps.

    Args:
        raw_maps: list of per-level (B, H, W, 4*reg_max + nc) maps (train output).
        batch: dict with
            'cls':    (B, M) int class ids (padding arbitrary),
            'bboxes': (B, M, 4) xywh normalized to [0,1],
            'mask_gt':(B, M) 1.0 for real boxes,
            optional 'recovery_loss' scalar.
        hyp: dict with 'box', 'cls', 'dfl', 'lrl' gains.
    """
    b = raw_maps[0].shape[0]
    no = raw_maps[0].shape[-1]
    feat_shapes = [(m.shape[1], m.shape[2]) for m in raw_maps]
    anchor_points, stride_t = make_anchors(feat_shapes, strides, 0.5)

    x = jnp.concatenate([m.reshape(b, -1, no) for m in raw_maps], axis=1)
    pred_distri = x[..., :4 * reg_max]                       # (B,N,64) logits
    pred_scores = x[..., 4 * reg_max:]                       # (B,N,nc) logits

    imgsz_h = feat_shapes[0][0] * strides[0]
    imgsz_w = feat_shapes[0][1] * strides[0]
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], dtype=x.dtype)

    gt_labels = batch["cls"].astype(jnp.int32)               # (B,M)
    gt_bboxes = xywh2xyxy(batch["bboxes"] * scale)           # (B,M,4) pixels
    mask_gt = batch["mask_gt"].astype(x.dtype)
    # padding rows must not influence the in-gt test: zero their boxes like the
    # reference's zero-padded preprocess output (loss.py:132-138)
    gt_bboxes = gt_bboxes * mask_gt[..., None]

    # decode boxes in grid units (loss.py:141-146)
    pred_dist_vals = dfl_decode(pred_distri, reg_max)        # (B,N,4)
    pred_bboxes = dist2bbox(pred_dist_vals, anchor_points[None], xywh=False)

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_t[None]),
        anchor_points * stride_t, gt_labels, gt_bboxes, mask_gt,
        num_classes=nc, topk=tal_topk, alpha=0.5, beta=6.0)
    target_bboxes, target_scores, fg_mask = (
        assign.target_bboxes, assign.target_scores, assign.fg_mask)

    target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    # cls loss (loss.py:181)
    loss_cls = jnp.sum(_bce_logits(pred_scores, target_scores)) / target_scores_sum

    # bbox + dfl loss (loss.py:59-73), masked to fg anchors
    fg = fg_mask.astype(x.dtype)                             # (B,N)
    tb = target_bboxes / stride_t[None]                      # grid units
    weight = jnp.sum(target_scores, axis=-1) * fg            # (B,N)
    iou = bbox_iou(pred_bboxes, tb, xywh=False, CIoU=True).squeeze(-1)
    loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

    target_ltrb = bbox2dist(anchor_points[None], tb, reg_max - 1)
    dist_logits = pred_distri.reshape(b, -1, 4, reg_max)
    dfl = _df_loss(dist_logits, target_ltrb, reg_max).squeeze(-1)  # (B,N)
    loss_dfl = jnp.sum(dfl * weight) / target_scores_sum

    loss_box = loss_box * hyp["box"]
    loss_cls = loss_cls * hyp["cls"]
    loss_dfl = loss_dfl * hyp["dfl"]

    total = (loss_box + loss_cls + loss_dfl) * b

    # recovery loss folded into cls item (RcoveryDetectionLoss, loss.py:393-415)
    rec = batch.get("recovery_loss")
    if rec is not None:
        rec = jnp.mean(rec)
        lrl = hyp.get("lrl", 0.0)
        total = total + lrl * rec
        loss_cls = loss_cls + lrl * rec

    items = LossItems(jax.lax.stop_gradient(loss_box),
                      jax.lax.stop_gradient(loss_cls),
                      jax.lax.stop_gradient(loss_dfl))
    return total, items
