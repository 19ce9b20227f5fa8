"""W8A8 3x3 convolution as a Pallas TPU kernel (int8 MXU path).

Round-2 probed XLA's int8 conv lowering at the backbone's representative
shape and measured only 1.32x over bf16 (~33% of the chip's int8 peak), so
the PTQ serving path was deferred (docs/BENCHMARKS.md). This kernel is the
round-3 attempt to unlock the remaining 2x: a direct stride-1 SAME conv
written as 9 shifted int8 matmuls accumulating in int32 on the MXU — the
formulation XLA's generic conv emitter does not pick for int8.

Layout (NHWC, channels on lanes):
  x  (B, H+2, W+2, C)  int8, spatially pre-padded by the caller (XLA pad)
  w  (3, 3, C, Co)     int8
  out (B, H, W, Co)    int8 = clip(round(acc_int32 * scale[co])), the W8A8
                       requantization (per-output-channel scale folds the
                       activation scale, weight scales, and BN).

Grid (B, H/TH, Co/TCO); each step DMAs a (TH+2, W+2, C) row slab from HBM
into VMEM scratch (halo rows overlap between steps — overlapping windows are
not expressible as BlockSpec blocks, so the slab streams via explicit DMA
like the enhance kernel) and accumulates the 9 taps:

    acc[th, w, co] += slab[dy:dy+TH, dx:dx+W, :] . w9[3*dy+dx]

Each tap is a (TH*W, C) x (C, TCO) int8 matmul with int32 accumulation
(preferred_element_type) — MXU-native on v5e (394 int8 TOPS vs 197 bf16
TFLOPS). dy slices cut the untiled leading axis (free); dx slices shift the
sublane axis by 0/1/2 (vector rotate, cheap).

Used by scripts/int8_probe.py for the measured decision on the PTQ path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(TH, H, W, w9_ref, scale_ref, x_hbm, out_ref, slab_ref, sem):
    b = pl.program_id(0)
    hi = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.dslice(hi * TH, TH + 2)], slab_ref, sem)
    dma.start()
    dma.wait()

    tco = out_ref.shape[-1]
    acc = jnp.zeros((TH, W, tco), jnp.int32)
    for k in range(9):
        dy, dx = k // 3, k % 3
        patch = slab_ref[dy:dy + TH, dx:dx + W, :]
        acc = acc + jax.lax.dot_general(
            patch, w9_ref[k], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    q = jnp.round(acc.astype(jnp.float32) * scale_ref[0][None, None, :])
    out_ref[0] = jnp.clip(q, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def conv3x3_s1_w8a8(x_padded, w, scale, th=16, interpret=False):
    """int8 SAME 3x3 stride-1 conv with per-channel requantization.

    x_padded (B, H+2, W+2, C) int8; w (3, 3, C, Co) int8; scale (Co,) f32.
    Returns (B, H, W, Co) int8. H must be divisible by th.
    """
    B, Hp, Wp, C = x_padded.shape
    H, W = Hp - 2, Wp - 2
    Co = w.shape[-1]
    assert H % th == 0, (H, th)
    w9 = w.reshape(9, C, Co)
    tco = min(Co, 256)
    assert Co % tco == 0

    return pl.pallas_call(
        functools.partial(_kernel, th, H, W),
        grid=(B, H // th, Co // tco),
        in_specs=[
            pl.BlockSpec((9, C, tco), lambda b, h, co: (0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tco), lambda b, h, co: (0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, W, tco),
                               lambda b, h, co: (b, h, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((th + 2, Wp, C), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(w9, scale.reshape(1, Co), x_padded)


def conv3x3_s1_w8a8_reference(x_padded, w, scale):
    """XLA reference for parity tests: identical math, generic conv."""
    acc = jax.lax.conv_general_dilated(
        x_padded.astype(jnp.int32), w.astype(jnp.int32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    q = jnp.round(acc.astype(jnp.float32) * scale[None, None, None, :])
    return jnp.clip(q, -128, 127).astype(jnp.int8)
