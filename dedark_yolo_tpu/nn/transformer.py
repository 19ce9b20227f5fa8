"""Transformer zoo (reference ultralytics/nn/modules/transformer.py).

Implements the general-purpose blocks: TransformerEncoderLayer, AIFI (encoder
with 2D sincos position embedding), TransformerLayer/TransformerBlock, MLP,
LayerNorm2d — plus the deformable-attention RT-DETR decoder stack
(MSDeformAttn / DeformableTransformerDecoderLayer / Decoder, reference
transformer.py:187-378). Note the reference's own RT-DETR path cannot run
(nn/tasks.py:467 and head.py:325 import `ultralytics.models.utils`, which does
not exist in the fork); here the decoder is fully functional for inference.

Attention here is standard dot-product attention — on TPU this lowers to MXU
matmuls and (for long sequences) XLA's fused attention; C3TR-scale sequences
(<=1600 tokens) need no custom kernel. Deformable attention's grid_sample
becomes four gather+lerp corner reads per level — tiny (nq*np points) next to
the backbone convs, and XLA fuses the lerp arithmetic around the gathers.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (reference transformer.py)."""
    c: int
    num_heads: int = 8
    cm: int = 2048
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, pos=None, train: bool = False):
        q = k = x if pos is None else x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c)(q, k, x)
        x = nn.LayerNorm()(x + attn)
        y = nn.Dense(self.cm)(x)
        y = nn.Dense(self.c)(jax.nn.gelu(y))
        return nn.LayerNorm()(x + y)


def sincos_pos_embed_2d(h, w, dim, temperature=10000.0):
    """2D sine-cosine position embedding (reference AIFI.build_2d_sincos...)."""
    assert dim % 4 == 0
    grid_w = jnp.arange(w, dtype=jnp.float32)
    grid_h = jnp.arange(h, dtype=jnp.float32)
    gw, gh = jnp.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = gw.reshape(-1)[..., None] * omega[None]
    out_h = gh.reshape(-1)[..., None] * omega[None]
    return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w),
                            jnp.sin(out_h), jnp.cos(out_h)], axis=1)[None]


class AIFI(nn.Module):
    """Attention-based intra-scale feature interaction on a (B,H,W,C) map."""
    c: int
    num_heads: int = 8
    cm: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        pos = sincos_pos_embed_2d(h, w, c).astype(x.dtype)
        seq = x.reshape(b, h * w, c)
        out = TransformerEncoderLayer(self.c, self.num_heads, self.cm)(
            seq, pos=pos, train=train)
        return out.reshape(b, h, w, c)


class TransformerLayer(nn.Module):
    """Self-attention + 2 linear layers, residual (reference TransformerLayer)."""
    c: int
    num_heads: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c, use_bias=False)(x, x, x)
        x = x + attn
        y = nn.Dense(self.c, use_bias=False)(x)
        y = nn.Dense(self.c, use_bias=False)(y)
        return x + y


class TransformerBlock(nn.Module):
    """Optional 1x1 conv + learned pos embed + n TransformerLayers
    (reference TransformerBlock; used by C3TR)."""
    c2: int
    num_heads: int = 4
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            from .layers import Conv
            x = Conv(self.c2, 1, 1)(x, train)
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, h * w, c))
        seq = seq + nn.Dense(self.c2)(pos)
        for _ in range(self.n):
            seq = TransformerLayer(self.c2, self.num_heads)(seq, train)
        return seq.reshape(b, h, w, self.c2)


class MLP(nn.Module):
    """Simple n-layer MLP (reference transformer.py MLP)."""
    hidden: int
    out: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out)(x)


class LayerNorm2d(nn.Module):
    """Channel layer norm over NHWC maps (reference LayerNorm2d)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.LayerNorm()(x)


# ---------------------------------------------------------------------------
# RT-DETR deformable decoder stack (reference transformer.py:187-378,
# modules/utils.py:33-77)
# ---------------------------------------------------------------------------


def inverse_sigmoid(x, eps: float = 1e-5):
    """log(x / (1-x)) with clamping (reference modules/utils.py:33-37)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1.0 - x, eps, None))


def _sample_level(value_l, loc, h, w):
    """Bilinear-sample one feature level at normalized locations.

    Equivalent of F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False) in the reference's multi_scale_deformable_attn
    (modules/utils.py:64-68), as four masked gathers + lerp.

    value_l: (B, H*W, nh, hd)  loc: (B, Lq, nh, np, 2) in [0,1] (x, y)
    returns: (B, Lq, nh, np, hd)
    """
    b, _, nh, hd = value_l.shape
    lq, npts = loc.shape[1], loc.shape[3]
    # align_corners=False pixel mapping: p = loc * size - 0.5
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    out = 0.0
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (wx1 if dx else 1.0 - wx1) * (wy1 if dy else 1.0 - wy1)
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = (yi * w + xi).transpose(0, 1, 3, 2)          # (B, Lq, np, nh)
        flat = flat.reshape(b, lq * npts, nh, 1)
        corner = jnp.take_along_axis(value_l, flat, axis=1)  # (B, Lq*np, nh, hd)
        corner = corner.reshape(b, lq, npts, nh, hd).transpose(0, 1, 3, 2, 4)
        out = out + corner * (wgt * inb)[..., None]
    return out


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (reference transformer.py:187-270).

    Per query: a linear head regresses nh*nl*np 2D sampling offsets around the
    reference box and softmax attention weights over all nl*np samples; the
    output is the weighted sum of bilinear reads from each level's value map.
    Offsets are scaled by the reference box size (4-point boxes, reference
    transformer.py:263-265).
    """
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    def _offset_bias(self, key, shape, dtype=jnp.float32):
        """Reference _reset_parameters (transformer.py:215-224): ring-of-heads
        initial offsets, point i pushed i+1 steps outward."""
        thetas = np.arange(self.n_heads, dtype=np.float32) * (
            2.0 * math.pi / self.n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :],
                       (1, self.n_levels, self.n_points, 1))
        for i in range(self.n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    @nn.compact
    def __call__(self, query, refer_bbox, values: Sequence[jnp.ndarray],
                 train: bool = False):
        """query (B, Lq, C); refer_bbox (B, Lq, 4) normalized cxcywh;
        values: per-level NHWC maps (B, Hl, Wl, C). Returns (B, Lq, C)."""
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        hd = self.d_model // nh
        b, lq = query.shape[:2]
        assert len(values) == nl

        offsets = nn.Dense(nh * nl * npts * 2,
                           kernel_init=nn.initializers.zeros,
                           bias_init=self._offset_bias,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(b, lq, nh, nl, npts, 2)
        attn = nn.Dense(nh * nl * npts, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(b, lq, nh, nl * npts), axis=-1)
        attn = attn.reshape(b, lq, nh, nl, npts)

        value_proj = nn.Dense(self.d_model,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="value_proj")
        # sampling locations around the reference box, offset scaled by box wh
        # (reference transformer.py:264-265)
        center = refer_bbox[:, :, None, None, None, :2]
        half_wh = refer_bbox[:, :, None, None, None, 2:] * 0.5
        loc = center + offsets / npts * half_wh      # (B, Lq, nh, nl, np, 2)

        out = 0.0
        for l, v in enumerate(values):
            h, w = v.shape[1], v.shape[2]
            v = value_proj(v).reshape(b, h * w, nh, hd)
            sampled = _sample_level(v, loc[:, :, :, l], h, w)
            out = out + (sampled * attn[:, :, :, l, :, None]).sum(axis=3)
        out = out.reshape(b, lq, self.d_model)
        return nn.Dense(self.d_model,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:273-327)."""
    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4

    @nn.compact
    def __call__(self, embed, refer_bbox, feats: Sequence[jnp.ndarray],
                 query_pos=None, attn_mask=None, train: bool = False):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            name="self_attn")(q, k, embed, mask=attn_mask)
        embed = nn.LayerNorm(name="norm1")(embed + tgt)

        tgt = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                           self.n_points, name="cross_attn")(
            embed if query_pos is None else embed + query_pos,
            refer_bbox, feats, train=train)
        embed = nn.LayerNorm(name="norm2")(embed + tgt)

        y = nn.Dense(self.d_ffn, name="linear1")(embed)
        y = nn.Dense(self.d_model, name="linear2")(jax.nn.relu(y))
        return nn.LayerNorm(name="norm3")(embed + y)


# The reference's DeformableTransformerDecoder wrapper (transformer.py:330-378)
# is a loop over DeformableTransformerDecoderLayer with per-layer bbox/score
# refinement heads that are OWNED by RTDETRDecoder (head.py:319-320). In flax
# the loop lives inside RTDETRDecoder (nn/heads.py) so every parameter sits in
# one scope; the layer and attention modules above are the reusable pieces.
