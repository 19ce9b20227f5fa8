"""lowlight_recovery: differentiable image enhancement as layer 0 of the detector.

Structure parity with the reference (ultralytics/nn/modules/llie.py:11-54):
  1. bilinear-resize the input to 256x256;
  2. ExtractParameters2 CNN regresses 15 filter parameters
     (ultralytics/nn/modules/common.py:52-78);
  3. apply 5 classical filters sequentially at full resolution in the order
     DeDark -> WhiteBalance -> Gamma -> Contrast -> USM
     (ultralytics/nn/modules/filter_cfg.py:65-75, filtersB.py).

TPU design: the four point filters (DeDark/WB/Gamma/Contrast) are a single fused
elementwise chain (`apply_point_filters`) — XLA fuses it into one VPU pass over the
image; a Pallas kernel version lives in ops/pallas/enhance_kernel.py. The USM
25x25 sigma=5 Gaussian is two separable 1-D depthwise convolutions with reflect
padding instead of the reference's 2-D 625-tap conv per channel.

Filter math (filtersB.py):
  tanh_range(l, r)(x) = tanh(x) * (r-l)/2 + (r+l)/2             (util_filters.py:295-304)
  DeDark  (:189-216): w = tanh_range(0.1, 1.0); tx = 1 - w*IcA;
                      out = (img - A) / max(tx, 0.01) + A
  WB      (:246-259): f = feat * [0,1,1]; s = exp(tanh_range(-0.5, 0.5)(f));
                      s /= 1e-5 + 0.27 sR + 0.67 sG + 0.06 sB;  out = img * s
  Gamma   (:227-233): g = exp(tanh_range(-ln3, ln3)(feat));  out = clip(img,1e-4)^g
  Contrast(:296-303): p = tanh(feat); lum = clip(rgb2lum(img),0,1);
                      clum = -cos(pi*lum)*0.5+0.5;
                      out = lerp(img, img/(lum+1e-6)*clum, p)
  USM     (:154-175): s = tanh_range(0, 5)(feat);  out = (img - gauss25(img))*s + img

Known reference quirk consciously fixed here: the reference's rgb2lum indexes the
LAST axis of an NCHW tensor (util_filters.py:270-273), so ContrastFilter actually
computes a "luminance" over image columns, not channels. We compute the intended
channel luminance (our tensors are NHWC, where the last axis IS channels).

Parameter layout in the 15-vector (filter_cfg.py:17-36): dedark 0, wb 1:4,
gamma 4, tone 5:13 (tone filter exists but is excluded from the chain, like the
reference), contrast 13, usm 14.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Parameter slots (reference filter_cfg.py)
NUM_FILTER_PARAMS = 15
DEDARK_SLOT = 0
WB_SLOTS = slice(1, 4)
GAMMA_SLOT = 4
TONE_SLOTS = slice(5, 13)
CONTRAST_SLOT = 13
USM_SLOT = 14

DEFOG_RANGE = (0.1, 1.0)
GAMMA_RANGE = 3.0
WB_LOG_RANGE = 0.5
USM_RANGE = (0.0, 5.0)
TONE_CURVE_RANGE = (0.5, 2.0)
CURVE_STEPS = 8

DEFAULT_A = 0.8
DEFAULT_ICA = 0.5


def tanh_range(x, l, r):
    return jnp.tanh(x) * (r - l) / 2.0 + (r + l) / 2.0


def rgb2lum(img):
    """Channel luminance of an NHWC image -> (..., 1)."""
    lum = 0.27 * img[..., 0] + 0.67 * img[..., 1] + 0.06 * img[..., 2]
    return lum[..., None]


def rgb2lum_reference_nchw(img):
    """The reference's rgb2lum AS EXECUTED on its NCHW tensors.

    util_filters.rgb2lum (:270-273) indexes the LAST axis, which for the NCHW
    images ContrastFilter feeds it (filtersB.py:296-303) is the W axis: the
    "luminance" is 0.27*col0 + 0.67*col1 + 0.06*col2 per (batch, channel, row),
    broadcast across the row. Verified against the executing reference by
    scripts/reference_duel.py (enhance output matches to ~1e-6 only with this
    quirk reproduced). In our NHWC layout: (B,H,1,C) from columns 0..2.
    """
    lum = (0.27 * img[:, :, 0, :] + 0.67 * img[:, :, 1, :]
           + 0.06 * img[:, :, 2, :])
    return lum[:, :, None, :]


def regress_filter_params(features):
    """Squash the raw 15-feature vector into per-filter parameter space.

    features: (B, 15) raw CNN output. Returns dict of per-filter parameters.
    """
    dedark_w = tanh_range(features[:, DEDARK_SLOT:DEDARK_SLOT + 1], *DEFOG_RANGE)  # (B,1)

    # dtype-preserving mask: an f32 constant here would silently upcast the
    # whole downstream image path (and the backbone) under bf16 compute
    wb_feat = features[:, WB_SLOTS] * jnp.asarray([0.0, 1.0, 1.0],
                                                  dtype=features.dtype)
    scale = jnp.exp(tanh_range(wb_feat, -WB_LOG_RANGE, WB_LOG_RANGE))
    lum = 1e-5 + 0.27 * scale[:, 0] + 0.67 * scale[:, 1] + 0.06 * scale[:, 2]
    wb_scale = scale / lum[:, None]  # (B,3)

    log_g = math.log(GAMMA_RANGE)
    gamma = jnp.exp(tanh_range(features[:, GAMMA_SLOT:GAMMA_SLOT + 1], -log_g, log_g))

    contrast = jnp.tanh(features[:, CONTRAST_SLOT:CONTRAST_SLOT + 1])
    usm = tanh_range(features[:, USM_SLOT:USM_SLOT + 1], *USM_RANGE)
    return {"dedark_w": dedark_w, "wb": wb_scale, "gamma": gamma,
            "contrast": contrast, "usm": usm}


def apply_point_filters(img, params, dedark_A, IcA, contrast_mode="channel"):
    """Fused DeDark -> WB -> Gamma -> Contrast chain (all elementwise).

    img: (B, H, W, 3) in [0,1]; dedark_A: (B, 3); IcA: (B, H, W, 1).
    contrast_mode: 'channel' computes the contrast luminance as the proper
    per-pixel RGB mix (our documented fix); 'reference' reproduces the
    executing reference bit-for-bit, whose ContrastFilter mixes the first
    three COLUMNS per row instead (see rgb2lum_reference_nchw). Use
    'reference' when running weights imported from (or exported to) the torch
    reference, so both stacks compute the same function.
    """
    w = params["dedark_w"][:, None, None, :]          # (B,1,1,1)
    A = dedark_A[:, None, None, :]                    # (B,1,1,3)
    tx = jnp.maximum(1.0 - w * IcA, 0.01)
    x = (img - A) / tx + A

    x = x * params["wb"][:, None, None, :]

    g = params["gamma"][:, None, None, :]
    x = jnp.power(jnp.maximum(x, 1e-4), g)

    p = params["contrast"][:, None, None, :]
    lum_fn = rgb2lum_reference_nchw if contrast_mode == "reference" else rgb2lum
    lum = jnp.clip(lum_fn(x), 0.0, 1.0)
    clum = -jnp.cos(math.pi * lum) * 0.5 + 0.5
    contrast_img = x / (lum + 1e-6) * clum
    x = (1.0 - p) * x + p * contrast_img
    return x


def gaussian_kernel_25(sigma=5.0, dtype=np.float32):
    """1-D 25-tap Gaussian, normalized (reference filtersB.py:155-161)."""
    x = np.arange(-12, 13, dtype=np.float64)
    k = np.exp(-0.5 * np.square(x / sigma))
    return (k / k.sum()).astype(dtype)


@lru_cache(maxsize=16)
def _usm_blur_matrix(n: int):
    """(n, n) banded matrix applying the 25-tap sigma-5 Gaussian along one
    axis with 'reflect' boundary folded in: B[o, reflect(o+k-12)] += g[k].

    Depthwise convs run on the TPU's VPU (no MXU mapping) — measured ~24 ms
    for the separable blur at b256@640; the same blur as two banded matmuls
    runs ~6 ms on the MXU (runs/roofline.json round-3 experiment)."""
    g = gaussian_kernel_25(dtype=np.float64)
    B = np.zeros((n, n), np.float64)
    for o in range(n):
        for k in range(25):
            i = o + k - 12
            if i < 0:
                i = -i
            if i >= n:
                i = 2 * n - 2 - i
            B[o, i] += g[k]
    return B.astype(np.float32)


def usm_filter(img, usm_param):
    """Unsharp mask with 25x25 sigma=5 Gaussian blur, reflect padding — MXU
    path: the separable blur as two banded matmuls (exact same math as the
    reference's dense 2-D conv per channel, filtersB.py:163-175).

    img: (B, H, W, 3); usm_param: (B, 1).
    """
    Bv = jnp.asarray(_usm_blur_matrix(img.shape[1]), img.dtype)
    Bh = jnp.asarray(_usm_blur_matrix(img.shape[2]), img.dtype)
    # f32 inputs keep f32 accuracy (3-pass bf16 on MXU); bf16 stays fast
    prec = "highest" if img.dtype == jnp.float32 else None
    blur = jnp.einsum("oh,bhwc->bowc", Bv, img, precision=prec)
    blur = jnp.einsum("ow,bhwc->bhoc", Bh, blur, precision=prec)
    s = usm_param[:, None, None, :]
    return (img - blur) * s + img


def usm_filter_conv(img, usm_param):
    """VPU fallback/reference implementation: two 1-D depthwise convs.
    Kept as the golden cross-check for usm_filter (tests/test_enhance.py).
    """
    k = jnp.asarray(gaussian_kernel_25(), dtype=img.dtype)
    pad = 12
    c = img.shape[-1]
    # horizontal pass: kernel (1, 25, Cin=1, ch_mult=1) depthwise
    kh = jnp.tile(k.reshape(1, 25, 1, 1), (1, 1, 1, c))
    xp = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    blur = jax.lax.conv_general_dilated(
        xp, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    kv = jnp.tile(k.reshape(25, 1, 1, 1), (1, 1, 1, c))
    xp = jnp.pad(blur, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    blur = jax.lax.conv_general_dilated(
        xp, kv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    s = usm_param[:, None, None, :]
    return (img - blur) * s + img


def apply_filter_chain(img, features, dedark_A, IcA, contrast_mode="channel"):
    """Full 5-filter chain from raw 15-vector CNN features."""
    params = regress_filter_params(features)
    x = apply_point_filters(img, params, dedark_A, IcA, contrast_mode)
    return usm_filter(x, params["usm"])


def tone_filter(img, tone_features):
    """8-step tone curve (reference filtersB.py:262-286). Defined for parity but
    excluded from cfg.filters in the reference (filter_cfg.py:68) and from our
    default chain. img: (B,H,W,3); tone_features: (B, 8) raw."""
    curve = tanh_range(tone_features, *TONE_CURVE_RANGE)  # (B,8)
    curve_sum = jnp.sum(curve, axis=-1, keepdims=True) + 1e-30  # (B,1)
    total = jnp.zeros_like(img)
    for i in range(CURVE_STEPS):
        seg = jnp.clip(img - i / CURVE_STEPS, 0.0, 1.0 / CURVE_STEPS)
        total = total + seg * curve[:, i][:, None, None, None]
    return total * CURVE_STEPS / curve_sum[:, :, None, None]


@lru_cache(maxsize=32)
def _bilinear_matrix(out_size: int, in_size: int):
    """Torch-convention bilinear resize weights (one axis) as a dense matrix.

    F.interpolate(mode='bilinear', align_corners=False) — the reference's
    llie.py:43 downsample to 256 — samples at half-pixel centers WITHOUT
    antialiasing. jax.image.resize antialiases on downscale, which feeds the
    parameter CNN a visibly different 256x256 image and diverges the whole
    filter chain (caught by scripts/reference_duel.py). Expressing the exact
    torch sampling as a (out, in) matrix keeps the op on the MXU.
    """
    i = np.arange(out_size)
    src = (i + 0.5) * (in_size / out_size) - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), np.float32)
    w[i, np.clip(lo, 0, in_size - 1)] += 1.0 - frac
    w[i, np.clip(lo + 1, 0, in_size - 1)] += frac
    return w


def torch_bilinear_resize(x, out_h: int, out_w: int):
    """NHWC resize matching F.interpolate(..., 'bilinear', align_corners=False)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    wy = jnp.asarray(_bilinear_matrix(out_h, h), x.dtype)
    wx = jnp.asarray(_bilinear_matrix(out_w, w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wy, x)
    return jnp.einsum("ow,bhwc->bhoc", wx, x)


class ExtractParameters2(nn.Module):
    """Parameter-regressor CNN: 5 x (conv3x3 s2 + LeakyReLU 0.1, no BN),
    3->16->32->32->32->32 on 256x256 input, flatten 2048 -> fc 64 -> fc 15.

    Reference: ultralytics/nn/modules/common.py:52-78.
    """
    out_dim: int = NUM_FILTER_PARAMS

    @nn.compact
    def __call__(self, x):
        widths = (16, 32, 32, 32, 32)
        for w in widths:
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=True)(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.1)
        x = x.reshape(x.shape[0], -1)  # (B, 8*8*32) = (B, 2048)
        x = jax.nn.leaky_relu(nn.Dense(64)(x), negative_slope=0.1)
        return nn.Dense(self.out_dim)(x)


class LowlightRecovery(nn.Module):
    """Layer-0 enhancement module (reference llie.py:11-54).

    __call__(x, dedark_A=None, IcA=None) with x NHWC in [0,1]. When priors are
    None, uses the reference defaults A=0.8, IcA=0.5 — which is what the reference
    effectively always uses (SURVEY.md §3.5 quirk: computed priors are only wired
    through when model.training is False, and standalone val/predict never computes
    them). Pass computed priors explicitly for the 'computed' prior mode.
    """
    out_channels: int = 3
    impl: str = "xla"  # 'xla' (pure chain) | 'pallas' (fused VMEM kernel)
    contrast_mode: str = "channel"  # 'reference' = bit-faithful to the torch fork

    @nn.compact
    def __call__(self, x, dedark_A=None, IcA=None, train: bool = False):
        b, h, w, _ = x.shape
        if dedark_A is None:
            dedark_A = jnp.full((b, 3), DEFAULT_A, dtype=x.dtype)
        if IcA is None:
            IcA = jnp.full((b, h, w, 1), DEFAULT_ICA, dtype=x.dtype)
        small = torch_bilinear_resize(x, 256, 256)
        features = ExtractParameters2()(small)
        if self.impl == "pallas" and self.contrast_mode == "channel":
            # lazy import (the kernel module imports this one for the formulas).
            # Differentiable in BOTH directions: fused VMEM forward + custom
            # VJP that rematerializes backward through the XLA chain, so
            # training uses the kernel too (interpret mode off-TPU for tests).
            # contrast_mode='reference' needs cross-column data the tiled
            # kernel doesn't stage — that mode runs the XLA chain.
            from ..ops.pallas.enhance_kernel import fused_enhance_diff
            return fused_enhance_diff(x, features, dedark_A, IcA,
                                      jax.default_backend() != "tpu")
        return apply_filter_chain(x, features, dedark_A, IcA,
                                  self.contrast_mode)
