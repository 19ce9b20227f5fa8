"""Transformer zoo (reference ultralytics/nn/modules/transformer.py).

Implements the general-purpose blocks: TransformerEncoderLayer, AIFI (encoder
with 2D sincos position embedding), TransformerLayer/TransformerBlock, MLP,
LayerNorm2d. The deformable-attention RT-DETR decoder stack
(MSDeformAttn/DeformableTransformerDecoder) supports only the fork's BROKEN
RT-DETR path (nn/tasks.py:467 imports a module that does not exist in the
reference) and is intentionally out of scope (SURVEY.md §0).

Attention here is standard dot-product attention — on TPU this lowers to MXU
matmuls and (for long sequences) XLA's fused attention; C3TR-scale sequences
(<=1600 tokens) need no custom kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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
