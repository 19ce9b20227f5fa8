"""Segmentation and pose losses in fixed shapes.

References: ultralytics/utils/loss.py:196-288 (v8SegmentationLoss +
single_mask_loss + crop_mask from utils/ops.py:553), 291-377 (v8PoseLoss +
KeypointLoss loss.py:87-99), 380-385 (v8ClassificationLoss).

The reference loops over images and their ragged fg-anchor sets. Here each image
contributes a STATIC `max_fg` top-confidence foreground anchors (gathered with
top_k); padding anchors carry zero weight. With max_fg >= the true fg count the
losses are exact; otherwise they subsample the strongest assignments (documented
truncation — raise max_fg for dense scenes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.anchors import make_anchors, dist2bbox, dfl_decode
from ..ops.boxes import xyxy2xywh
from .detection import _bce_logits
from .tal import task_aligned_assign

# COCO keypoint OKS sigmas (reference metrics.py OKS_SIGMA)
OKS_SIGMA = jnp.asarray(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07,
     1.07, 0.87, 0.87, 0.89, 0.89]) / 10.0


def crop_mask(masks, boxes_xyxy):
    """Zero mask pixels outside their box (reference ops.py:553-570 crop_mask).
    masks: (..., h, w); boxes: (..., 4) in mask-pixel units."""
    h, w = masks.shape[-2], masks.shape[-1]
    r = jnp.arange(w, dtype=masks.dtype)[None, :]
    c = jnp.arange(h, dtype=masks.dtype)[:, None]
    x1 = boxes_xyxy[..., 0][..., None, None]
    y1 = boxes_xyxy[..., 1][..., None, None]
    x2 = boxes_xyxy[..., 2][..., None, None]
    y2 = boxes_xyxy[..., 3][..., None, None]
    keep = ((r >= x1) & (r < x2) & (c >= y1) & (c < y2)).astype(masks.dtype)
    return masks * keep


def _assign(raw_maps, batch, nc, strides, reg_max):
    """Shared detect-style assignment; returns everything segment/pose need."""
    b = raw_maps[0].shape[0]
    no = raw_maps[0].shape[-1]
    feat_shapes = [(m.shape[1], m.shape[2]) for m in raw_maps]
    anchor_points, stride_t = make_anchors(feat_shapes, strides, 0.5)
    x = jnp.concatenate([m.reshape(b, -1, no) for m in raw_maps], axis=1)
    pred_distri = x[..., :4 * reg_max]
    pred_scores = x[..., 4 * reg_max:]
    imgsz_h = feat_shapes[0][0] * strides[0]
    imgsz_w = feat_shapes[0][1] * strides[0]
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    from ..ops.boxes import xywh2xyxy
    gt_bboxes = xywh2xyxy(batch["bboxes"] * scale) * batch["mask_gt"][..., None]
    pred_vals = dfl_decode(pred_distri, reg_max)
    pred_bboxes = dist2bbox(pred_vals, anchor_points[None], xywh=False)
    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_t[None]),
        anchor_points * stride_t, batch["cls"].astype(jnp.int32), gt_bboxes,
        batch["mask_gt"], num_classes=nc)
    return (assign, pred_scores, pred_distri, pred_bboxes, anchor_points,
            stride_t, (imgsz_h, imgsz_w))


def _topk_fg(assign, max_fg):
    """Static top-`max_fg` foreground anchors per image by target score sum.
    Returns (idx (B,K), weight (B,K) 0/1)."""
    score = jnp.sum(assign.target_scores, axis=-1)          # (B,N)
    fg = assign.fg_mask.astype(score.dtype)
    vals, idx = jax.lax.top_k(score * fg + fg * 1e-6, max_fg)
    return idx, (vals > 0).astype(jnp.float32)


def segmentation_loss(raw_maps, coef_maps, protos, batch, nc, strides, hyp,
                      reg_max=16, max_fg=64, overlap=True):
    """Segment loss: detect losses + per-anchor mask BCE (loss.py:204-288).

    batch extra key 'masks': (B, mh, mw) overlap-encoded instance masks
    (pixel value = gt index + 1) when overlap=True, else (B, M, mh, mw).
    Returns (total, dict(box, seg, cls, dfl)).
    """
    (assign, pred_scores, pred_distri, pred_bboxes, anchor_points, stride_t,
     (imgsz_h, imgsz_w)) = _assign(raw_maps, batch, nc, strides, reg_max)
    b = pred_scores.shape[0]
    tss = jnp.maximum(jnp.sum(assign.target_scores), 1.0)

    loss_cls = jnp.sum(_bce_logits(pred_scores, assign.target_scores)) / tss

    from ..ops.boxes import bbox_iou
    from ..ops.anchors import bbox2dist
    from .detection import _df_loss
    fg = assign.fg_mask.astype(jnp.float32)
    tb = assign.target_bboxes / stride_t[None]
    weight = jnp.sum(assign.target_scores, axis=-1) * fg
    iou = bbox_iou(pred_bboxes, tb, xywh=False, CIoU=True).squeeze(-1)
    loss_box = jnp.sum((1.0 - iou) * weight) / tss
    target_ltrb = bbox2dist(anchor_points[None], tb, reg_max - 1)
    dist_logits = pred_distri.reshape(b, -1, 4, reg_max)
    loss_dfl = jnp.sum(_df_loss(dist_logits, target_ltrb, reg_max).squeeze(-1)
                       * weight) / tss

    # ---- mask loss over static top-K fg anchors ----
    nm = protos.shape[-1]
    mh, mw = protos.shape[1], protos.shape[2]
    coefs = jnp.concatenate([m.reshape(b, -1, nm) for m in coef_maps], axis=1)
    idx, w_fg = _topk_fg(assign, max_fg)                    # (B,K)
    sel_coef = jnp.take_along_axis(coefs, idx[..., None], axis=1)        # (B,K,nm)
    sel_gt = jnp.take_along_axis(assign.target_gt_idx, idx, axis=1)      # (B,K)
    sel_box = jnp.take_along_axis(assign.target_bboxes, idx[..., None], axis=1)

    # predicted masks: (B,K,mh,mw) = coef @ protos
    pred_masks = jnp.einsum("bkn,bhwn->bkhw", sel_coef, protos)
    masks = batch["masks"].astype(jnp.float32)
    if overlap:
        gt_masks = (masks[:, None] == (sel_gt[..., None, None].astype(jnp.float32)
                                       + 1.0)).astype(jnp.float32)
    else:
        gt_masks = jnp.take_along_axis(masks, sel_gt[..., None, None], axis=1)
    # scale target boxes to mask space
    sc = jnp.asarray([mw / imgsz_w, mh / imgsz_h, mw / imgsz_w, mh / imgsz_h],
                     jnp.float32)
    mxyxy = sel_box * sc
    xyxyn = sel_box / jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    marea = jnp.clip(xyxy2xywh(xyxyn)[..., 2] * xyxy2xywh(xyxyn)[..., 3], 1e-4)

    mloss = _bce_logits(pred_masks, gt_masks)
    mloss = crop_mask(mloss, mxyxy).mean(axis=(-2, -1)) / marea           # (B,K)
    denom = jnp.maximum(jnp.sum(w_fg, axis=1), 1.0)
    loss_seg = jnp.sum(jnp.sum(mloss * w_fg, axis=1) / denom)

    loss_box = loss_box * hyp["box"]
    loss_seg = loss_seg * hyp["box"] / b
    loss_cls = loss_cls * hyp["cls"]
    loss_dfl = loss_dfl * hyp["dfl"]
    total = (loss_box + loss_seg + loss_cls + loss_dfl) * b
    items = {"box": loss_box, "seg": loss_seg, "cls": loss_cls, "dfl": loss_dfl}
    return total, jax.tree_util.tree_map(jax.lax.stop_gradient, items)


def pose_loss(raw_maps, kpt_maps, batch, nc, strides, hyp, kpt_shape=(17, 3),
              reg_max=16, max_fg=64):
    """Pose loss: detect losses + OKS keypoint loss + kpt-visibility BCE
    (loss.py:303-369). batch extra key 'keypoints': (B, M, nk, 3) normalized."""
    (assign, pred_scores, pred_distri, pred_bboxes, anchor_points, stride_t,
     (imgsz_h, imgsz_w)) = _assign(raw_maps, batch, nc, strides, reg_max)
    b = pred_scores.shape[0]
    tss = jnp.maximum(jnp.sum(assign.target_scores), 1.0)

    loss_cls = jnp.sum(_bce_logits(pred_scores, assign.target_scores)) / tss

    from ..ops.boxes import bbox_iou
    from ..ops.anchors import bbox2dist
    from .detection import _df_loss
    fg = assign.fg_mask.astype(jnp.float32)
    tb = assign.target_bboxes / stride_t[None]
    weight = jnp.sum(assign.target_scores, axis=-1) * fg
    iou = bbox_iou(pred_bboxes, tb, xywh=False, CIoU=True).squeeze(-1)
    loss_box = jnp.sum((1.0 - iou) * weight) / tss
    target_ltrb = bbox2dist(anchor_points[None], tb, reg_max - 1)
    loss_dfl = jnp.sum(_df_loss(pred_distri.reshape(b, -1, 4, reg_max),
                                target_ltrb, reg_max).squeeze(-1) * weight) / tss

    # ---- keypoints over static top-K fg anchors ----
    nk, kdim = kpt_shape
    kpts = jnp.concatenate([m.reshape(b, -1, nk, kdim) for m in kpt_maps], axis=1)
    # decode to grid units (loss.py:371-377 kpts_decode)
    xy = kpts[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    pred_kpts = jnp.concatenate([xy, kpts[..., 2:]], axis=-1) if kdim == 3 else xy

    idx, w_fg = _topk_fg(assign, max_fg)
    sel_gt = jnp.take_along_axis(assign.target_gt_idx, idx, axis=1)
    sel_kpt = jnp.take_along_axis(pred_kpts.reshape(b, -1, nk * kdim),
                                  idx[..., None], axis=1).reshape(b, -1, nk, kdim)
    sel_stride = jnp.take_along_axis(jnp.tile(stride_t[None, :, 0], (b, 1)),
                                     idx, axis=1)                       # (B,K)
    sel_box = jnp.take_along_axis(assign.target_bboxes, idx[..., None], axis=1)

    gt_k = batch["keypoints"].astype(jnp.float32)                      # (B,M,nk,3)
    gt_k = gt_k * jnp.asarray([imgsz_w, imgsz_h, 1.0], jnp.float32)
    sel_gt_k = jnp.take_along_axis(
        gt_k.reshape(b, -1, nk * 3), sel_gt[..., None], axis=1).reshape(b, -1, nk, 3)
    # to grid units of each anchor's stride
    sel_gt_xy = sel_gt_k[..., :2] / sel_stride[..., None, None]
    kpt_mask = (sel_gt_k[..., 2] != 0).astype(jnp.float32) * w_fg[..., None]

    area = jnp.clip(xyxy2xywh(sel_box / sel_stride[..., None])[..., 2] *
                    xyxy2xywh(sel_box / sel_stride[..., None])[..., 3], 1e-4)
    sigmas = OKS_SIGMA if nk == 17 else jnp.ones(nk) / nk
    d = jnp.sum((sel_kpt[..., :2] - sel_gt_xy) ** 2, axis=-1)           # (B,K,nk)
    e = d / (2 * sigmas[None, None, :]) ** 2 / (area[..., None] + 1e-9) / 2
    n_valid = jnp.maximum(jnp.sum(kpt_mask), 1.0)
    kpt_factor = (kpt_mask.size) / n_valid
    loss_kpt = kpt_factor * jnp.sum((1 - jnp.exp(-e)) * kpt_mask) / kpt_mask.size

    if kdim == 3:
        vis_bce = _bce_logits(sel_kpt[..., 2], (kpt_mask > 0).astype(jnp.float32))
        loss_kobj = jnp.sum(vis_bce * w_fg[..., None]) / jnp.maximum(
            jnp.sum(w_fg) * nk, 1.0)
    else:
        loss_kobj = jnp.float32(0.0)

    loss_box = loss_box * hyp["box"]
    loss_kpt = loss_kpt * hyp.get("pose", 12.0) / b
    loss_kobj = loss_kobj * hyp.get("kobj", 1.0) / b
    loss_cls = loss_cls * hyp["cls"]
    loss_dfl = loss_dfl * hyp["dfl"]
    total = (loss_box + loss_kpt + loss_kobj + loss_cls + loss_dfl) * b
    items = {"box": loss_box, "pose": loss_kpt, "kobj": loss_kobj,
             "cls": loss_cls, "dfl": loss_dfl}
    return total, jax.tree_util.tree_map(jax.lax.stop_gradient, items)


def classification_loss(logits, labels, nbs=64):
    """Cross-entropy summed / 64 (reference loss.py:380-385)."""
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    ce = -jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1)
    loss = jnp.sum(ce) / nbs
    return loss, jax.lax.stop_gradient(loss)
