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
from .layers import Conv


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


class Segment(nn.Module):
    """Segmentation head: Detect + mask-coefficient branch + Proto prototypes.

    Reference head.py:177-200 — per-level 2xConv + 1x1 producing nm mask
    coefficients, and a Proto module on the highest-resolution feature.
    Returns (detect_maps, coef_maps, protos).
    """
    nc: int = 80
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        from .layers import Proto
        protos = Proto(c_=self.npr, c2=self.nm)(xs[0], train)
        c4 = max(xs[0].shape[-1] // 4, self.nm)
        coefs = []
        for i, x in enumerate(xs):
            c = Conv(c4, 3, name=f"cv4_{i}_0")(x, train)
            c = Conv(c4, 3, name=f"cv4_{i}_1")(c, train)
            c = nn.Conv(self.nm, (1, 1), use_bias=True, name=f"cv4_{i}_2")(c)
            coefs.append(c)
        det = Detect(nc=self.nc, reg_max=self.reg_max, strides=self.strides,
                     name="detect")(xs, train)
        return det, coefs, protos


class Pose(nn.Module):
    """Pose head: Detect + keypoint regression branch (reference head.py:203-241).

    kpt_shape (nk, 3) -> per-anchor nk*3 values. Returns (detect_maps, kpt_maps).
    """
    nc: int = 1
    kpt_shape: Tuple[int, int] = (17, 3)
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(xs[0].shape[-1] // 4, nk)
        kpts = []
        for i, x in enumerate(xs):
            k = Conv(c4, 3, name=f"cv4_{i}_0")(x, train)
            k = Conv(c4, 3, name=f"cv4_{i}_1")(k, train)
            k = nn.Conv(nk, (1, 1), use_bias=True, name=f"cv4_{i}_2")(k)
            kpts.append(k)
        det = Detect(nc=self.nc, reg_max=self.reg_max, strides=self.strides,
                     name="detect")(xs, train)
        return det, kpts


class RTDETRDecoder(nn.Module):
    """RT-DETR decoder head (reference head.py:263-457).

    Projects the FPN levels to a shared hidden dim, scores every spatial
    position with an encoder head, selects the top-nq positions as object
    queries, and refines their boxes through ndl deformable-attention decoder
    layers (transformer.py:330-378 folded in here — the per-layer refinement
    heads belong to this module in the reference too, head.py:319-320).

    Returns (B, nq, 4 + nc): normalized cxcywh boxes + sigmoid class scores —
    NMS-free. The reference's own RT-DETR path cannot execute (head.py:325
    imports the missing `ultralytics.models.utils`); this one runs. The
    contrastive-denoising training branch (get_cdn_group) lives in that missing
    module and is therefore N/A; training-mode forward here behaves like eval
    without denoising queries.

    Deviation (documented): reference _generate_anchors normalizes grid x by h
    and y by w (head.py:368-369, valid_WH = [h, w]) — a transposition that is
    invisible on square maps but wrong on rectangular ones; we normalize
    x/w, y/h.
    """
    nc: int = 80
    hd: int = 256       # hidden dim
    nq: int = 300       # queries (clamped to the anchor count for tiny inputs)
    ndp: int = 4        # decoder sampling points
    nh: int = 8         # attention heads
    ndl: int = 6        # decoder layers
    d_ffn: int = 1024
    eval_idx: int = -1
    strides: Tuple[int, ...] = (8, 16, 32)

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        from .transformer import (DeformableTransformerDecoderLayer,
                                  inverse_sigmoid)
        nl = len(xs)
        b = xs[0].shape[0]
        bias_cls = float(-math.log((1 - 0.01) / 0.01)) / 80 * self.nc

        # backbone feature projection: 1x1 conv (no bias) + BN per level
        # (reference head.py:293)
        feats = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.hd, (1, 1), use_bias=False,
                        name=f"input_proj_{i}_conv")(x)
            # plain nn.BatchNorm2d defaults (head.py:293), not YOLO's tuned BN
            p = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"input_proj_{i}_bn")(p)
            feats.append(p)
        seq = jnp.concatenate([f.reshape(b, -1, self.hd) for f in feats], 1)

        # static anchors, one per spatial position (reference head.py:360-377)
        anchors, valid = [], []
        eps = 1e-2
        for i, f in enumerate(feats):
            h, w = f.shape[1], f.shape[2]
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing="ij")
            xy = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1)
            wh = jnp.full_like(xy, 0.05 * (2.0 ** i))
            anchors.append(jnp.concatenate([xy, wh], -1).reshape(-1, 4))
        anchors = jnp.concatenate(anchors, 0)[None]            # (1, N, 4)
        valid = jnp.all((anchors > eps) & (anchors < 1 - eps), -1,
                        keepdims=True)
        anchors = jnp.where(valid, inverse_sigmoid(anchors), jnp.inf)

        # encoder head scores every position (reference head.py:396-421)
        features = nn.Dense(self.hd, name="enc_output_0")(
            seq * valid.astype(seq.dtype))
        features = nn.LayerNorm(name="enc_output_1")(features)
        enc_scores = nn.Dense(self.nc,
                              bias_init=nn.initializers.constant(bias_cls),
                              name="enc_score_head")(features)
        y = jax.nn.relu(nn.Dense(self.hd, name="enc_bbox_head_0")(features))
        y = jax.nn.relu(nn.Dense(self.hd, name="enc_bbox_head_1")(y))
        y = nn.Dense(4, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name="enc_bbox_head_2")(y)
        enc_bboxes = y + anchors                               # unsigmoided

        # top-k query selection by best class score
        nq = min(self.nq, seq.shape[1])
        _, topk = jax.lax.top_k(enc_scores.max(-1), nq)        # (B, nq)
        refer = jnp.take_along_axis(enc_bboxes, topk[..., None], axis=1)
        embed = jnp.take_along_axis(features, topk[..., None], axis=1)
        if train:  # static content queries detach from the encoder
            refer = jax.lax.stop_gradient(refer)
            embed = jax.lax.stop_gradient(embed)
        refer = jax.nn.sigmoid(refer)

        # iterative refinement decoder; query_pos_head is SHARED across layers
        # (reference head.py:311 — one MLP instance)
        qp0 = nn.Dense(2 * self.hd, name="query_pos_head_0")
        qp1 = nn.Dense(self.hd, name="query_pos_head_1")
        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.ndl + self.eval_idx
        dec_bboxes, dec_logits = [], []
        output = embed
        for i in range(self.ndl):
            qp = qp1(jax.nn.relu(qp0(refer)))
            output = DeformableTransformerDecoderLayer(
                self.hd, self.nh, self.d_ffn, nl, self.ndp,
                name=f"decoder_layer_{i}")(
                output, refer, feats, query_pos=qp, train=train)
            y = jax.nn.relu(nn.Dense(self.hd, name=f"dec_bbox_head_{i}_0")(output))
            y = jax.nn.relu(nn.Dense(self.hd, name=f"dec_bbox_head_{i}_1")(y))
            y = nn.Dense(4, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name=f"dec_bbox_head_{i}_2")(y)
            refined = jax.nn.sigmoid(y + inverse_sigmoid(refer))
            # every layer's heads run in BOTH modes so the param tree is
            # mode-independent (flax creates params only for executed modules);
            # in eval XLA dead-code-eliminates layers past eval_idx
            dec_bboxes.append(refined)
            dec_logits.append(nn.Dense(
                self.nc, bias_init=nn.initializers.constant(bias_cls),
                name=f"dec_score_head_{i}")(output))
            refer = jax.lax.stop_gradient(refined) if train else refined
        if train:
            # per-layer aux outputs for the set-matching loss (losses/rtdetr.py);
            # the encoder proposals train the query-selection head
            return {"dec_bboxes": jnp.stack(dec_bboxes),
                    "dec_logits": jnp.stack(dec_logits),
                    "enc_bboxes": jnp.take_along_axis(
                        jax.nn.sigmoid(enc_bboxes), topk[..., None], axis=1),
                    "enc_logits": jnp.take_along_axis(
                        enc_scores, topk[..., None], axis=1)}
        return jnp.concatenate([dec_bboxes[eval_idx],
                                jax.nn.sigmoid(dec_logits[eval_idx])], -1)


def decode_keypoints(kpt_maps: Sequence[jnp.ndarray], strides: Sequence[int],
                     kpt_shape=(17, 3)):
    """Decode raw kpt maps -> (B, N, nk, 3) in pixels (reference head.py kpts_decode):
    xy = (2 * sigmoid-free offsets + anchor - 0.5) * stride; visibility sigmoid."""
    from ..ops.anchors import make_anchors
    feat_shapes = [(m.shape[1], m.shape[2]) for m in kpt_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    b = kpt_maps[0].shape[0]
    nk = kpt_shape[0]
    x = jnp.concatenate([m.reshape(b, -1, kpt_shape[0], kpt_shape[1])
                         for m in kpt_maps], axis=1)
    xy = (x[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * \
        stride_t[None, :, None, :]
    if kpt_shape[1] == 3:
        vis = jax.nn.sigmoid(x[..., 2:3])
        return jnp.concatenate([xy, vis], axis=-1)
    return xy


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
