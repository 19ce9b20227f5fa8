"""Task-Aligned Assigner in fixed shapes (no data-dependent boolean indexing).

Reference: ultralytics/utils/tal.py:57-244 (TaskAlignedAssigner, topk=10, alpha=0.5,
beta=6.0 as used by v8DetectionLoss, loss.py:120).

The reference builds ragged masks with boolean indexing (tal.py:141-160) and
scatter loops (tal.py:184-194). Here every step is a masked dense op over the
static (B, max_boxes, num_anchors) grid:
  - candidate mask: anchors inside GT boxes (select_candidates_in_gts, tal.py:12-26);
  - align metric s^alpha * CIoU^beta computed densely, zeroed outside the mask;
  - top-k selection via an exact two-phase chunked lax.top_k (top-k per
    128-wide chunk, then top-k over chunk winners — exact because k <= chunk)
    + one-hot accumulation (replaces the
    scatter_add_ loop; the reference also zeroes anchors picked >1 time by a
    single GT — impossible here since we never collapse invalid indices to 0);
  - multi-GT conflicts resolved by highest overlap (select_highest_overlaps,
    tal.py:29-54);
  - target score normalization per tal.py:120-125.

Everything is wrapped in stop_gradient by the caller (the reference decorates
forward with @torch.no_grad()).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray   # (B, N) int32
    target_bboxes: jnp.ndarray   # (B, N, 4) xyxy
    target_scores: jnp.ndarray   # (B, N, nc) float
    fg_mask: jnp.ndarray         # (B, N) bool
    target_gt_idx: jnp.ndarray   # (B, N) int32


def select_candidates_in_gts(xy_centers, gt_bboxes, eps=1e-9):
    """(N,2) anchor centers inside (B,M,4) xyxy GTs -> (B,M,N) float mask."""
    lt = gt_bboxes[..., None, :2]          # (B,M,1,2)
    rb = gt_bboxes[..., None, 2:]          # (B,M,1,2)
    deltas = jnp.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1)
    return (jnp.min(deltas, axis=-1) > eps).astype(gt_bboxes.dtype)


def _select_topk(metrics, topk, valid_mask):
    """Top-k per (b, m) over anchors -> (B,M,N) 0/1 mask. valid_mask: (B,M).

    The single sort-based lax.top_k over the 8400-anchor axis costs 47.6 ms
    at B48/M128 on v5e; a two-phase chunked top-k (top-k per 128-wide chunk,
    then top-k over the C*k survivors) computes the same exact result in
    ~12 ms (scripts/bench_loss.py). Ties order arbitrarily in either lowering
    (as in torch.topk), and duplicate indices remain impossible, so the
    count>1 guard semantics are unchanged. Global winner indices come back
    through a one-hot contraction instead of a TPU gather."""
    b, m, n = metrics.shape
    k = min(topk, n)
    chunk = 128
    if n <= 2 * chunk:
        _, topk_idx = jax.lax.top_k(metrics, k)                # (B,M,k)
    else:
        c = -(-n // chunk)                                     # ceil chunks
        padded = jnp.pad(metrics, ((0, 0), (0, 0), (0, c * chunk - n)),
                         constant_values=-jnp.inf)
        mp = padded.reshape(b, m, c, chunk)
        kc = min(k, chunk)
        v1, i1 = jax.lax.top_k(mp, kc)                         # (B,M,C,kc)
        g1 = (i1 + jnp.arange(c, dtype=i1.dtype)[None, None, :, None]
              * chunk).reshape(b, m, c * kc)
        v2, i2 = jax.lax.top_k(v1.reshape(b, m, c * kc), k)    # (B,M,k)
        topk_idx = jnp.einsum(
            "bmkc,bmc->bmk", jax.nn.one_hot(i2, c * kc, dtype=metrics.dtype),
            g1.astype(metrics.dtype)).astype(jnp.int32)
    keep = valid_mask[..., None].astype(metrics.dtype)        # (B,M,1)
    onehot = jax.nn.one_hot(topk_idx, n, dtype=metrics.dtype)  # (B,M,k,N)
    count = jnp.sum(onehot * keep[..., None], axis=2)          # (B,M,N)
    return jnp.where(count > 1, 0.0, count)


def task_aligned_assign(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                        mask_gt, num_classes, topk=10, alpha=0.5, beta=6.0,
                        eps=1e-9):
    """Compute the task-aligned assignment (all fixed shapes).

    Args:
        pd_scores: (B, N, nc) sigmoid class probabilities.
        pd_bboxes: (B, N, 4) xyxy in the same units as gt_bboxes.
        anc_points: (N, 2) anchor centers (same units).
        gt_labels: (B, M) int class ids.
        gt_bboxes: (B, M, 4) xyxy.
        mask_gt:   (B, M) validity (1 for real boxes, 0 for padding).
    """
    dtype = pd_scores.dtype
    b, n, nc = pd_scores.shape
    m = gt_bboxes.shape[1]
    mask_gt_f = mask_gt.astype(dtype)

    # candidate anchors inside each gt
    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)  # (B,M,N)

    # alignment metric (tal.py:141-160). TPU gathers over the class axis
    # serialize; the one-hot einsum is a tiny batched matmul instead
    # (2.9 -> 1.2 ms, scripts/bench_loss.py)
    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)      # (B,M)
    bbox_scores = jnp.einsum("bmc,bnc->bmn",
                             jax.nn.one_hot(labels, nc, dtype=dtype),
                             pd_scores)                            # (B,M,N)
    pre_mask = mask_in_gts * mask_gt_f[..., None]
    bbox_scores = bbox_scores * pre_mask

    overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :],
                        xywh=False, CIoU=True).squeeze(-1)
    overlaps = jnp.clip(overlaps, 0.0, None) * pre_mask            # (B,M,N)
    # alpha=0.5/beta=6.0 as sqrt and a square-cube chain: jnp.power with a
    # float exponent lowers to exp(y*log(x)) per element over the (B,M,N)
    # grid; these forms are transcendental-free
    if alpha == 0.5 and beta == 6.0:
        o2 = overlaps * overlaps
        align_metric = jnp.sqrt(bbox_scores) * (o2 * o2 * o2)
    else:
        align_metric = (bbox_scores ** alpha) * (overlaps ** beta)

    mask_topk = _select_topk(align_metric, topk, mask_gt_f > 0)
    mask_pos = mask_topk * mask_in_gts * mask_gt_f[..., None]      # (B,M,N)

    # resolve anchors claimed by multiple gts -> highest overlap (tal.py:29-54)
    fg_counts = jnp.sum(mask_pos, axis=1)                          # (B,N)
    max_overlap_gt = jnp.argmax(overlaps, axis=1)                  # (B,N)
    is_max = jax.nn.one_hot(max_overlap_gt, m, dtype=dtype)        # (B,N,M)
    is_max = jnp.swapaxes(is_max, 1, 2)                            # (B,M,N)
    mask_pos = jnp.where(fg_counts[:, None, :] > 1, is_max, mask_pos)
    fg_mask = jnp.sum(mask_pos, axis=1) > 0                        # (B,N)
    target_gt_idx = jnp.argmax(mask_pos, axis=1)                   # (B,N)

    # gather targets (tal.py:198-243) — one-hot contractions again: exact
    # (one nonzero term per row) and MXU-friendly where TPU row gathers
    # serialize (3.0 -> 1.4 ms each, scripts/bench_loss.py)
    gt_onehot = jax.nn.one_hot(target_gt_idx, m, dtype=dtype)            # (B,N,M)
    target_labels = jnp.einsum(
        "bnm,bm->bn", gt_onehot, labels.astype(dtype)).astype(jnp.int32)
    target_bboxes = jnp.einsum("bnm,bmc->bnc", gt_onehot, gt_bboxes)     # (B,N,4)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=dtype)
    target_scores = target_scores * fg_mask[..., None].astype(dtype)

    # normalize (tal.py:120-125)
    align_metric = align_metric * mask_pos
    pos_align = jnp.max(align_metric, axis=-1, keepdims=True)            # (B,M,1)
    pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)  # (B,M,1)
    norm = jnp.max(align_metric * pos_overlaps / (pos_align + eps), axis=1)  # (B,N)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels.astype(jnp.int32), target_bboxes,
                        target_scores, fg_mask, target_gt_idx.astype(jnp.int32))
