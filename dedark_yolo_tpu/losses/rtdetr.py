"""RT-DETR training loss: one-to-one set matching + VFL/L1/GIoU.

The reference repo ships the RT-DETR decoder but its loss module is absent
(nn/tasks.py:467 imports `ultralytics.models.utils.loss`, a directory that
does not exist in the fork), so RT-DETR training is impossible there. This is
a working TPU-native implementation of the standard RT-DETR objective
(varifocal classification with IoU-aware targets, L1 + GIoU box losses,
auxiliary losses on every decoder layer and on the encoder proposals).

Matching is a fixed-shape, in-graph GREEDY one-to-one assignment instead of
the Hungarian algorithm: gt count M is small (<= max_boxes), so M rounds of a
masked global argmin over the (nq, M) cost matrix run entirely inside the XLA
graph with static shapes — no host round trip per step. Greedy is within a few
percent of the optimal assignment cost in practice (asserted against scipy's
Hungarian in tests), and one-to-one-ness — the property DETR training actually
needs — is exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou, xywh2xyxy
from .detection import LossItems


def greedy_assign(cost, gt_mask):
    """One-to-one greedy assignment of queries to ground truths.

    Args:
        cost: (B, Nq, M) matching cost; lower is better.
        gt_mask: (B, M) 1.0 for real gt rows.
    Returns:
        assign_q: (B, M) int32 — query index matched to each gt (arbitrary for
        unmatched rows; mask any use with the returned matched mask).
        matched:  (B, M) float — 1.0 where the gt actually received a fresh
        query. When an image has more real gts than queries (nq < M real
        boxes), the excess gts stay 0 here and must be dropped from the loss —
        reusing queries would silently break the one-to-one property DETR
        training relies on.
    """
    b, nq, m = cost.shape
    big = jnp.asarray(1e9, cost.dtype)
    # used rows/columns must be penalized STRICTLY above padded-gt columns
    # (both at `big` would tie and let a later iteration overwrite a real
    # assignment), so the used penalty is 3 orders of magnitude larger
    used_pen = jnp.asarray(1e12, cost.dtype)
    cost = jnp.where(gt_mask[:, None, :] > 0, cost, big)

    def body(_, state):
        c, used_q, used_g, assign_q, matched = state
        cc = c + used_q[:, :, None] * used_pen + used_g[:, None, :] * used_pen
        flat = cc.reshape(b, nq * m)
        idx = jnp.argmin(flat, axis=1)                   # (B,)
        # a pick is real only if it lands on a fresh query AND a fresh, real
        # gt: anything at >= big is a padded column or an exhausted row
        val = jnp.take_along_axis(flat, idx[:, None], axis=1).squeeze(1)
        ok = (val < big).astype(c.dtype)
        q, g = idx // m, idx % m
        rows = jnp.arange(b)
        used_q = used_q.at[rows, q].max(ok)
        used_g = used_g.at[rows, g].max(ok)
        assign_q = assign_q.at[rows, g].set(
            jnp.where(ok > 0, q, assign_q[rows, g]).astype(jnp.int32))
        matched = matched.at[rows, g].max(ok)
        return c, used_q, used_g, assign_q, matched

    state = (cost, jnp.zeros((b, nq), cost.dtype), jnp.zeros((b, m), cost.dtype),
             jnp.zeros((b, m), jnp.int32), jnp.zeros((b, m), cost.dtype))
    _, _, _, assign_q, matched = jax.lax.fori_loop(0, m, body, state)
    return assign_q, matched


def _layer_loss(pred_boxes, pred_logits, gt_boxes, gt_cls, gt_mask, nc,
                alpha=0.75, gamma=2.0):
    """Single-layer DETR loss. pred_boxes (B,Nq,4) sigmoid cxcywh normalized;
    pred_logits (B,Nq,nc); gt_boxes (B,M,4) cxcywh normalized."""
    b, nq, _ = pred_logits.shape
    p = jax.nn.sigmoid(pred_logits)
    gt_cls = gt_cls.astype(jnp.int32)

    # matching cost (stop-grad): -score[gt class] + 5*L1 + 2*(1-GIoU)
    p_at_cls = jnp.take_along_axis(
        p[:, :, None, :].repeat(gt_cls.shape[1], axis=2),
        gt_cls[:, None, :, None], axis=-1).squeeze(-1)       # (B,Nq,M)
    l1 = jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]).sum(-1)
    giou = bbox_iou(xywh2xyxy(pred_boxes)[:, :, None, :],
                    xywh2xyxy(gt_boxes)[:, None, :, :],
                    xywh=False, GIoU=True).squeeze(-1)       # (B,Nq,M)
    cost = jax.lax.stop_gradient(-p_at_cls + 5.0 * l1 + 2.0 * (1.0 - giou))
    assign_q, matched = greedy_assign(cost, gt_mask)         # (B,M)
    # drop gts that could not get a fresh query (only possible when an image
    # has more real boxes than nq) — keeps the assignment strictly one-to-one
    gt_mask = gt_mask * matched

    num_gt = jnp.maximum(gt_mask.sum(), 1.0)

    pb = jnp.take_along_axis(pred_boxes, assign_q[..., None], axis=1)  # (B,M,4)
    # box losses, padding rows masked
    loss_l1 = (jnp.abs(pb - gt_boxes).sum(-1) * gt_mask).sum() / num_gt
    giou_m = bbox_iou(xywh2xyxy(pb), xywh2xyxy(gt_boxes), xywh=False,
                      GIoU=True).squeeze(-1)                 # (B,M)
    loss_giou = ((1.0 - giou_m) * gt_mask).sum() / num_gt

    # varifocal classification: target = IoU of the matched pair at the gt
    # class, 0 elsewhere; negatives down-weighted by alpha * p^gamma
    iou_m = jax.lax.stop_gradient(
        bbox_iou(xywh2xyxy(pb), xywh2xyxy(gt_boxes), xywh=False)
        .squeeze(-1)) * gt_mask                              # (B,M)
    tgt = jnp.zeros((b, nq, nc), p.dtype)
    idx_b = jnp.arange(b)[:, None]
    tgt = tgt.at[idx_b, assign_q, gt_cls].max(jnp.maximum(iou_m, 0.0))
    pos = (tgt > 0).astype(p.dtype)
    w = alpha * jnp.power(p, gamma) * (1.0 - pos) + tgt
    bce = jnp.maximum(pred_logits, 0) - pred_logits * tgt + \
        jnp.log1p(jnp.exp(-jnp.abs(pred_logits)))
    loss_cls = (bce * w).sum() / num_gt

    return loss_giou * 2.0, loss_cls * 1.0, loss_l1 * 5.0


def rtdetr_loss(outputs: dict, batch: dict, nc: int, hyp: dict | None = None):
    """(total, LossItems) from RTDETRDecoder train-mode outputs.

    outputs: {'dec_bboxes': (L,B,Nq,4), 'dec_logits': (L,B,Nq,nc),
              'enc_bboxes': (B,Nq,4), 'enc_logits': (B,Nq,nc)}
    batch:   'cls' (B,M), 'bboxes' (B,M,4) normalized cxcywh, 'mask_gt' (B,M),
             optional 'recovery_loss' scalar (lrl folded into the cls item,
             mirroring RcoveryDetectionLoss loss.py:388-415).
    Items map to the trainer's [box, cls, dfl] slots as [giou, vfl, l1] of the
    final decoder layer. Total is pre-scaled by batch size like detection_loss.
    """
    gt_boxes = batch["bboxes"]
    gt_cls = batch["cls"]
    gt_mask = batch["mask_gt"].astype(outputs["dec_bboxes"].dtype)
    b = gt_boxes.shape[0]

    ndl = outputs["dec_bboxes"].shape[0]
    total = 0.0
    final = None
    for i in range(ndl):
        g, c, l = _layer_loss(outputs["dec_bboxes"][i],
                              outputs["dec_logits"][i],
                              gt_boxes, gt_cls, gt_mask, nc)
        total = total + g + c + l
        final = (g, c, l)
    # encoder proposal aux loss (RT-DETR trains the query-selection head too)
    g, c, l = _layer_loss(outputs["enc_bboxes"], outputs["enc_logits"],
                          gt_boxes, gt_cls, gt_mask, nc)
    total = (total + g + c + l) * b

    loss_box, loss_cls, loss_l1 = final
    rec = batch.get("recovery_loss")
    if rec is not None and hyp is not None:
        rec = jnp.mean(rec)
        lrl = hyp.get("lrl", 0.0)
        total = total + lrl * rec
        loss_cls = loss_cls + lrl * rec
    items = LossItems(jax.lax.stop_gradient(loss_box),
                      jax.lax.stop_gradient(loss_cls),
                      jax.lax.stop_gradient(loss_l1))
    return total, items
