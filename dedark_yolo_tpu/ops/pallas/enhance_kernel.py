"""Fused lowlight-recovery filter chain as Pallas TPU kernels.

Two kernels, dispatched by VMEM fit (f32 throughout — the DeDark division by
tx >= 0.01 and gamma exponent up to 3 amplify storage error, so bf16 staging
visibly perturbs the output):

  - `_full_kernel`: the whole 5-filter chain (DeDark -> WB -> Gamma -> Contrast
    -> USM 25-tap separable Gaussian) in ONE VMEM-resident pass per image — the
    image is read from HBM once and written once.
  - `_usm_kernel`: blur+sharpen only; the point chain runs in XLA (which fuses
    it into a single HBM pass anyway) and the kernel removes the two extra
    conv_h/conv_v HBM round trips.
  - beyond that: the pure-JAX chain (nn/enhance.py), identical math.

Layout: (3, Hp, Wp) channel-first planes so W maps to TPU lanes, H to sublanes.
The caller reflect-pads by 12 (XLA pad). The separable blur runs on the MXU as
two banded matmuls — blur = K_v @ Y_pad @ K_h with K_h[j, i] = g[j - i] — which
is both faster than 2x25 shifted VPU multiply-adds and orders of magnitude
cheaper to compile (the unrolled-MAC formulation produced 150 slice ops and
~10-minute Mosaic compiles; it also kept every shifted slice live on the VMEM
stack).

Formula parity with nn/enhance.py (which documents parity with the reference's
filtersB.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...nn import enhance as E

PAD = 12  # Gaussian radius
_VMEM_BUDGET = 14 * 1024 * 1024  # ~16MB/core minus headroom


def banded_blur_matrices(h, w):
    """(K_v (h, hp), K_h (wp, w)) banded Gaussian operators, numpy f32.

    htmp = Y_pad @ K_h   : htmp[r, i] = sum_k g[k] * Y[r, i + k]
    blur = K_v @ htmp    : blur[i, c] = sum_k g[k] * htmp[i + k, c]
    """
    g = E.gaussian_kernel_25().astype(np.float32)
    hp, wp = h + 2 * PAD, w + 2 * PAD
    kh = np.zeros((wp, w), np.float32)
    for i in range(w):
        kh[i:i + 25, i] = g
    kv = np.zeros((h, hp), np.float32)
    for i in range(h):
        kv[i, i:i + 25] = g
    return kv, kh


def _point_chain_into(params_ref, img_ref, ica_ref, i, y_ref):
    """DeDark -> WB -> Gamma -> Contrast, written into y_ref (3, hp, wp).

    Channels are stored into the scratch ref eagerly so at most one full plane
    SSA value is live at a time."""
    dd_w = params_ref[i, 0]
    gamma = params_ref[i, 7]
    contrast_p = params_ref[i, 8]
    for c in range(3):
        a_c = params_ref[i, 1 + c]
        wb_c = params_ref[i, 4 + c]
        xc = img_ref[0, c]
        inv_tx = 1.0 / jnp.maximum(1.0 - dd_w * ica_ref[0], 0.01)
        dd = (xc - a_c) * inv_tx + a_c
        wbv = dd * wb_c
        y_ref[c] = jnp.exp(gamma * jnp.log(jnp.maximum(wbv, 1e-4)))
    lum = jnp.clip(0.27 * y_ref[0] + 0.67 * y_ref[1] + 0.06 * y_ref[2], 0.0, 1.0)
    scale = ((1.0 - contrast_p) +
             contrast_p * ((-jnp.cos(math.pi * lum) * 0.5 + 0.5) / (lum + 1e-6)))
    for c in range(3):
        y_ref[c] = y_ref[c] * scale


def _blur_sharpen(yc, kv, kh, usm_s, h, w):
    """MXU separable blur + unsharp on a padded plane value (hp, wp) -> (h, w)."""
    htmp = jnp.dot(yc, kh, preferred_element_type=jnp.float32)      # (hp, w)
    blur = jnp.dot(kv, htmp, preferred_element_type=jnp.float32)    # (h, w)
    center = yc[PAD:PAD + h, PAD:PAD + w]
    return (center - blur) * usm_s + center


def _full_kernel(params_ref, kv_ref, kh_ref, img_ref, ica_ref, out_ref, y_ref):
    """Whole chain. img_ref: (1, 3, hp, wp) padded; out_ref: (1, 3, h, w);
    params_ref: full (B, 16) SMEM array indexed by program_id."""
    h, w = out_ref.shape[2], out_ref.shape[3]
    i = pl.program_id(0)
    usm_s = params_ref[i, 9]
    _point_chain_into(params_ref, img_ref, ica_ref, i, y_ref)
    for c in range(3):
        out_ref[0, c] = _blur_sharpen(y_ref[c], kv_ref[...], kh_ref[...],
                                      usm_s, h, w)


def _usm_kernel(params_ref, kv_ref, kh_ref, y_in_ref, out_ref):
    """Blur+sharpen only. y_in_ref: (1, 1, hp, wp) point-filtered, padded."""
    h, w = out_ref.shape[2], out_ref.shape[3]
    usm_s = params_ref[pl.program_id(0), 9]
    out_ref[0, 0] = _blur_sharpen(y_in_ref[0, 0], kv_ref[...], kh_ref[...],
                                  usm_s, h, w)


def _fits_full(h, w):
    hp, wp = h + 2 * PAD, w + 2 * PAD
    need = (3 * hp * wp * 4 * 2    # img block + y scratch
            + hp * wp * 4          # ica
            + 3 * h * w * 4        # out
            + (h * hp + wp * w) * 4  # banded operators
            + 3 * hp * wp * 4)     # live SSA temps (point chain + matmul out)
    return need <= _VMEM_BUDGET


def _fits_usm(h, w):
    hp, wp = h + 2 * PAD, w + 2 * PAD
    need = (hp * wp * 4 + h * w * 4 + (h * hp + wp * w) * 4 + 2 * hp * w * 4)
    return need <= _VMEM_BUDGET


def _param_vec(features, dedark_A):
    p = E.regress_filter_params(features)
    b = features.shape[0]
    return jnp.concatenate(
        [p["dedark_w"], dedark_A, p["wb"], p["gamma"], p["contrast"], p["usm"],
         jnp.zeros((b, 6), features.dtype)], axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_enhance_pallas(img, features, dedark_A, IcA, interpret=False):
    """Single-pass full chain. img: (B, H, W, 3) in [0,1]."""
    b, h, w, _ = img.shape
    pvec = _param_vec(features, dedark_A)
    x = jnp.transpose(img, (0, 3, 1, 2)).astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect")
    ica = jnp.transpose(IcA, (0, 3, 1, 2))[:, 0].astype(jnp.float32)
    icap = jnp.pad(ica, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect")
    hp, wp = h + 2 * PAD, w + 2 * PAD
    kv, kh = banded_blur_matrices(h, w)

    out = pl.pallas_call(
        _full_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (B, 16) params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # K_v (h, hp)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # K_h (wp, w)
            pl.BlockSpec((1, 3, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, hp, wp), jnp.float32)],
        interpret=interpret,
    )(pvec, jnp.asarray(kv), jnp.asarray(kh), xp, icap)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(img.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def usm_pallas(y, usm_param, interpret=False):
    """Pallas blur+sharpen for the two-stage path. y: (B, H, W, 3) point-filtered;
    usm_param: (B, 1)."""
    b, h, w, _ = y.shape
    pvec = jnp.zeros((b, 16), jnp.float32).at[:, 9].set(
        usm_param[:, 0].astype(jnp.float32))
    x = jnp.transpose(y, (0, 3, 1, 2)).astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect")
    hp, wp = h + 2 * PAD, w + 2 * PAD
    kv, kh = banded_blur_matrices(h, w)

    out = pl.pallas_call(
        _usm_kernel,
        grid=(b, 3),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (B, 16) params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # K_v
            pl.BlockSpec(memory_space=pltpu.VMEM),   # K_h
            pl.BlockSpec((1, 1, hp, wp), lambda i, c: (i, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        interpret=interpret,
    )(pvec, jnp.asarray(kv), jnp.asarray(kh), xp)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(y.dtype)


def fused_enhance(img, features, dedark_A, IcA, interpret=False):
    """Dispatch by VMEM fit; always matches nn/enhance.apply_filter_chain."""
    b, h, w, _ = img.shape
    if _fits_full(h, w):
        return fused_enhance_pallas(img, features, dedark_A, IcA,
                                    interpret=interpret)
    if _fits_usm(h, w):
        p = E.regress_filter_params(features)
        y = E.apply_point_filters(img, p, dedark_A, IcA)
        return usm_pallas(y, p["usm"], interpret=interpret)
    return E.apply_filter_chain(img, features, dedark_A, IcA)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_enhance_diff(img, features, dedark_A, IcA, interpret=False):
    """Differentiable fused enhance: Pallas VMEM kernel forward, rematerialized
    backward through the identical-math XLA chain (nn/enhance.py).

    Only the RAW inputs are saved as residuals — the backward re-derives the
    chain's intermediates from them, so no full-resolution activations are
    stored between forward and backward (jax.checkpoint semantics by
    construction: the enhance stage costs one extra cheap elementwise pass in
    backward and zero activation HBM, which is the right trade at 640px where
    each stored plane is 4.9MB/image)."""
    return fused_enhance(img, features, dedark_A, IcA, interpret=interpret)


def _diff_fwd(img, features, dedark_A, IcA, interpret):
    return (fused_enhance(img, features, dedark_A, IcA, interpret=interpret),
            (img, features, dedark_A, IcA))


def _diff_bwd(interpret, res, g):
    img, features, dedark_A, IcA = res
    _, vjp = jax.vjp(E.apply_filter_chain, img, features, dedark_A, IcA)
    return vjp(g)


fused_enhance_diff.defvjp(_diff_fwd, _diff_bwd)
