"""Fused lowlight-recovery filter chain as Pallas TPU kernels.

Two kernels, dispatched by VMEM fit. The STAGING dtype follows the image:
f32 inputs stage f32 (point math is sensitive — the DeDark division by
tx >= 0.01 and gamma exponents up to 3 amplify storage error); bf16 inputs
stage bf16 (halves VMEM/HBM bytes — at bf16 the input itself already bounds
precision, and the in-kernel point math still runs f32):

  - `_make_full_kernel(T, ...)`: the whole 5-filter chain (DeDark -> WB ->
    Gamma -> Contrast -> USM 25-tap separable Gaussian) in ONE VMEM-resident
    pass per image with T static column tiles — the image is read from HBM
    once and written once; covers 640px in bf16 (T=4).
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


def _blur_sharpen(yc, kv, kh, usm_s, h, w):
    """MXU separable blur + unsharp on a padded plane value (hp, wp) -> (h, w).

    Accepts f32 or bf16 planes/operators; matmuls accumulate in f32 either way
    (bf16 x bf16 -> f32 is the MXU-native form)."""
    htmp = jnp.dot(yc, kh.astype(yc.dtype),
                   preferred_element_type=jnp.float32).astype(yc.dtype)
    blur = jnp.dot(kv.astype(yc.dtype), htmp,
                   preferred_element_type=jnp.float32)              # (h, w)
    center = yc[PAD:PAD + h, PAD:PAD + w].astype(jnp.float32)
    return (center - blur) * usm_s + center


def _make_full_kernel(T, h, w):
    """Streaming one-pass chain kernel with T static column tiles.

    Planes are stored TRANSPOSED — (W, H): image columns on sublanes, rows on
    lanes — so the per-tile DMA slices cut the SUBLANE dim (8-aligned; lane-dim
    DMA slices must be 128-aligned, which arbitrary tile widths are not).
    img/ica/out all stay in HBM (memory_space=ANY) and tiles stream through
    VMEM scratch with explicit DMAs: Mosaic double-buffers BLOCKED operands
    across grid steps, which blew the 16M VMEM at 640px (19.3M scoped) with
    whole-image blocks. fori_loops everywhere — unrolled Python loops stack
    every iteration's temps on Mosaic's allocation stack.

    Blur in this layout: htmp = K_w @ Y_tile, blur = htmp @ K_v2 with
    K_w (tw, twp) banded over the tile's padded columns and K_v2 (hp, h)
    banded over padded rows. The tile point chain recomputes the 2*PAD
    column overlap (elementwise — cheap)."""
    tw = w // T
    twp = tw + 2 * PAD

    def kernel(params_ref, kw_ref, kv2_ref, img_hbm, ica_hbm, out_hbm,
               y_ref, xt_ref, it_ref, rt_ref, sem_x, sem_i, sem_o):
        i = pl.program_id(0)
        dd_w = params_ref[i, 0]
        gamma = params_ref[i, 7]
        p_con = params_ref[i, 8]
        usm_s = params_ref[i, 9]
        dt = y_ref.dtype
        rows = slice(None)

        def tile_body(j, carry):
            c0 = j * tw
            dma_i = pltpu.make_async_copy(
                ica_hbm.at[i, pl.dslice(c0, twp), rows], it_ref, sem_i)
            dma_i.start()
            dma_i.wait()

            def point_body(c, carry2):
                a_c = params_ref[i, 1 + c]
                wb_c = params_ref[i, 4 + c]
                dma_x = pltpu.make_async_copy(
                    img_hbm.at[i, c, pl.dslice(c0, twp), rows], xt_ref, sem_x)
                dma_x.start()
                dma_x.wait()
                xc = xt_ref[...].astype(jnp.float32)
                ica = it_ref[...].astype(jnp.float32)
                tx = jnp.maximum(1.0 - dd_w * ica, 0.01)
                v = (xc - a_c) / tx + a_c
                v = v * wb_c
                v = jnp.exp(gamma * jnp.log(jnp.maximum(v, 1e-4)))
                y_ref[c, rows, rows] = v.astype(dt)
                return carry2

            jax.lax.fori_loop(0, 3, point_body, 0, unroll=False)
            lum = jnp.clip(0.27 * y_ref[0].astype(jnp.float32)
                           + 0.67 * y_ref[1].astype(jnp.float32)
                           + 0.06 * y_ref[2].astype(jnp.float32), 0.0, 1.0)
            scale = ((1.0 - p_con) + p_con *
                     ((-jnp.cos(math.pi * lum) * 0.5 + 0.5) / (lum + 1e-6))
                     ).astype(dt)

            def blur_body(c, carry2):
                yc = (y_ref[c, rows, rows].astype(jnp.float32)
                      * scale.astype(jnp.float32)).astype(dt)   # (twp, hp)
                htmp = jnp.dot(kw_ref[...], yc,
                               preferred_element_type=jnp.float32).astype(dt)
                blur = jnp.dot(htmp, kv2_ref[...],
                               preferred_element_type=jnp.float32)  # (tw, h)
                center = yc[PAD:PAD + tw, PAD:PAD + h].astype(jnp.float32)
                rt_ref[...] = ((center - blur) * usm_s
                               + center).astype(rt_ref.dtype)
                dma_o = pltpu.make_async_copy(
                    rt_ref, out_hbm.at[i, c, pl.dslice(c0, tw), rows], sem_o)
                dma_o.start()
                dma_o.wait()
                return carry2

            jax.lax.fori_loop(0, 3, blur_body, 0, unroll=False)
            return carry

        jax.lax.fori_loop(0, T, tile_body, 0, unroll=False)

    return kernel


def _usm_kernel(params_ref, kv_ref, kh_ref, y_in_ref, out_ref):
    """Blur+sharpen only. y_in_ref: (1, 1, hp, wp) point-filtered, padded."""
    h, w = out_ref.shape[2], out_ref.shape[3]
    usm_s = params_ref[pl.program_id(0), 9]
    out_ref[0, 0] = _blur_sharpen(y_in_ref[0, 0], kv_ref[...], kh_ref[...],
                                  usm_s, h, w).astype(out_ref.dtype)


def _tile_estimate(h, w, T, itemsize):
    """Scoped-VMEM estimate of the T-tiled streaming kernel: image/ica/out
    live in HBM, so VMEM holds only the operators, the tile scratch and the
    loop body's f32 transients."""
    hp = h + 2 * PAD
    tw = w // T
    twp = tw + 2 * PAD
    return (tw * twp * itemsize          # K_w
            + hp * h * itemsize          # K_v2
            + 3 * twp * hp * itemsize    # y tiles
            + 2 * twp * hp * itemsize    # img + ica tiles
            + tw * h * itemsize          # result tile
            + 2 * twp * hp * 4)          # live f32 planes in the loop body


def _pick_tiles(h, w, itemsize):
    """Fewest column tiles whose VMEM estimate fits (bigger tiles = fewer
    DMAs and larger MXU matmuls), or None. Tile width must be a sublane
    multiple (8) for the DMA slice alignment."""
    for T in (1, 2, 4, 5, 8, 10, 16):
        if w % T:
            continue
        tw = w // T
        if tw % 8:
            continue
        if tw >= 2 * PAD and _tile_estimate(h, w, T, itemsize) <= _VMEM_BUDGET:
            return T
    return None


def _fits_full(h, w, itemsize=4):
    return _pick_tiles(h, w, itemsize) is not None


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
    """Single-pass full chain. img: (B, H, W, 3) in [0,1].

    Staging dtype follows the image: f32 inputs stage f32; bf16 inputs stage
    bf16 (half the VMEM — the one-pass kernel then fits 640px, removing the
    two-stage path's extra point-chain/transpose HBM round trips; point math
    still runs f32 in-kernel)."""
    b, h, w, _ = img.shape
    dt = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    pvec = _param_vec(features, dedark_A)
    # TRANSPOSED planes (B, 3, W, H): tile DMAs slice the sublane dim (see
    # _make_full_kernel). The minor (lane) dim is zero-padded up to a 128
    # multiple so HBM storage is tile-exact — DMA slices of a non-storage-
    # aligned minor dim are rejected by Mosaic.
    hp = h + 2 * PAD
    h_al = -(-h // 128) * 128        # out minor dim, storage-aligned
    hp_al = -(-max(hp, PAD + h_al) // 128) * 128  # in minor dim, covers center
    x = jnp.transpose(img, (0, 3, 2, 1)).astype(dt)
    xp = jnp.pad(x, ((0, 0), (0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect")
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, hp_al - hp)))
    ica = jnp.transpose(IcA, (0, 3, 2, 1))[:, 0].astype(dt)
    icap = jnp.pad(ica, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect")
    icap = jnp.pad(icap, ((0, 0), (0, 0), (0, hp_al - hp)))
    itemsize = 2 if dt == jnp.bfloat16 else 4
    T = _pick_tiles(h, w, itemsize)
    assert T is not None, f"one-pass kernel does not fit VMEM at {h}x{w}/{dt}"
    tw = w // T
    twp = tw + 2 * PAD
    # banded operators for the transposed layout: K_w (tw, twp) over the
    # tile's padded columns (identical for every tile — the DMA aligns the
    # support), K_v2 (hp_al, h_al) over padded rows, zero beyond the real
    # support; banded_blur_matrices gives these for (h=tw, w=h)
    kw, kv2 = banded_blur_matrices(tw, h)
    kv2 = np.pad(kv2, ((0, hp_al - hp), (0, h_al - h)))
    out = pl.pallas_call(
        _make_full_kernel(T, h_al, w),   # kernel works in the aligned frame
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (B, 16) params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # K_w (tw, twp)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # K_v2 (hp_al, h_al)
            pl.BlockSpec(memory_space=pl.ANY),       # img stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # ica stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # out stays in HBM
        out_shape=jax.ShapeDtypeStruct((b, 3, w, h_al), dt),
        scratch_shapes=[pltpu.VMEM((3, twp, hp_al), dt),   # y tiles
                        pltpu.VMEM((twp, hp_al), dt),      # img tile
                        pltpu.VMEM((twp, hp_al), dt),      # ica tile
                        pltpu.VMEM((tw, h_al), dt),        # result tile
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(pvec, jnp.asarray(kw, dt), jnp.asarray(kv2, dt), xp, icap)
    return jnp.transpose(out[:, :, :, :h], (0, 3, 2, 1)).astype(img.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def usm_pallas(y, usm_param, interpret=False):
    """Pallas blur+sharpen for the two-stage path. y: (B, H, W, 3) point-filtered;
    usm_param: (B, 1). Stages in y's dtype — bf16 inputs move half the HBM
    bytes through the transpose/pad/kernel passes (matmuls still accumulate
    f32 on the MXU)."""
    b, h, w, _ = y.shape
    dt = y.dtype if y.dtype == jnp.bfloat16 else jnp.float32
    pvec = jnp.zeros((b, 16), jnp.float32).at[:, 9].set(
        usm_param[:, 0].astype(jnp.float32))
    x = jnp.transpose(y, (0, 3, 1, 2)).astype(dt)
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
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), dt),
        interpret=interpret,
    )(pvec, jnp.asarray(kv, dt), jnp.asarray(kh, dt), xp)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(y.dtype)


def fused_enhance(img, features, dedark_A, IcA, interpret=False):
    """Dispatch by VMEM fit; always matches nn/enhance.apply_filter_chain."""
    b, h, w, _ = img.shape
    itemsize = 2 if img.dtype == jnp.bfloat16 else 4
    if _fits_full(h, w, itemsize):
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
