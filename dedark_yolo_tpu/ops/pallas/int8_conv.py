"""W8A8 3x3 convolution as a Pallas TPU kernel (int8 MXU path).

Round-2 probed XLA's int8 conv lowering at the backbone's representative
shape and measured only 1.32x over bf16 (~33% of the chip's int8 peak), so
the PTQ serving path was deferred (docs/BENCHMARKS.md). This kernel is the
round-3 attempt to unlock the remaining 2x: a direct stride-1 SAME conv
written as shifted int8 matmuls accumulating in int32 on the MXU — the
formulation XLA's generic conv emitter does not pick for int8.

Layout (NHWC, channels on lanes):
  x  (B, H+2, W+2, C)  int8, spatially pre-padded by the caller (XLA pad)
  w  (3, 3, C, Co)     int8
  out (B, H, W, Co)    int8; tail selected by `act`:
      act=None       : clip(round(acc * scale[co])) — plain W8A8
                       requantization (scale folds activation scale, weight
                       scales, and BN)
      act='silu'     : clip(round(silu(acc * scale[co]) / out_scale)) — the
                       whole quantized Conv(+BN)+SiLU block in ONE kernel
                       (a bf16-sigmoid variant tripped a Mosaic verifier
                       bug — 'vector.broadcast' — and was dropped)

Grid (B, H/TH, Co/TCO); each step needs a (TH+2, Wp, C) row slab whose halo
rows overlap the neighbour step — overlapping windows are not expressible
as BlockSpec blocks, so slabs stream from HBM (memory_space ANY) through a
DOUBLE-BUFFERED VMEM scratch: step i waits the copy started at step i-1 and
immediately starts the copy for step i+1, hiding the DMA behind the matmuls
(pallas_guide double-buffering pattern). Mosaic requires the slab's tiled
width to be a whole number of 8-sublane tiles, hence the Wp alignment pad.

Tap formulations (`taps`):
  1: im2col-in-VMEM — all 9 shifted views are STORED into one (TH, W, 9C)
     scratch (the dx shifts carry different sublane offsets, which Mosaic's
     concat rejects; stores normalize them) and contracted in a single
     K=9C matmul. No accumulator adds at all.
  3: per dy row (free slice of the untiled axis) the three dx shifts are
     stored into a (TH, W, 3C) scratch and contracted at K=3C; 2 adds.
  9: nine direct K=C dots on shifted ref slices; 8 int32 adds.

Measured at (b32, 80x80, C=Co=256): taps=9 is the fastest (~56 ms / 24-layer
chain, 103 T/s) — the int32 adds are VPU-cheap, while taps=1/3's explicit
scratch round-trips cost more than the shift-materializations they replace.
All formulations plateau at 21-27% of the int8 peak: the bound is operand
shift/copy traffic, not the MXU or the emitter (XLA's int8 conv lands in the
same band). Hence taps=9 default.

int8 matmuls with int32 accumulation (preferred_element_type) are
MXU-native on v5e (394 int8 TOPS vs 197 bf16 TFLOPS). Measured numbers and
the PTQ go/no-go live in docs/BENCHMARKS.md; scripts/int8_probe.py
reproduces them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _slab_copy(x_hbm, slabs, sems, buf, b, row0, TH):
    return pltpu.make_async_copy(
        x_hbm.at[b, pl.dslice(row0, TH + 2)], slabs.at[buf], sems.at[buf])


def _kernel(TH, H, W, act, taps, COT, w3_ref, scale_ref, oscale_ref, x_hbm,
            out_ref, slabs_ref, patch_ref, sems):
    b = pl.program_id(0)
    hi = pl.program_id(1)
    co = pl.program_id(2)
    HT = H // TH
    i = (b * HT + hi) * COT + co
    # slabs are keyed by (b, hi) — all COT output-channel steps reuse one
    # copy, so the DMA waits/starts once per slab, not once per step
    si = b * HT + hi
    nslab = pl.num_programs(0) * pl.num_programs(1)
    buf = si % 2

    @pl.when(i == 0)
    def _():
        _slab_copy(x_hbm, slabs_ref, sems, 0, b, hi * TH, TH).start()

    @pl.when(co == 0)
    def _():
        _slab_copy(x_hbm, slabs_ref, sems, buf, b, hi * TH, TH).wait()

    @pl.when((co == COT - 1) & (si + 1 < nslab))
    def _():
        nhi = (si + 1) % HT
        nb = (si + 1) // HT
        _slab_copy(x_hbm, slabs_ref, sems, (si + 1) % 2, nb, nhi * TH,
                   TH).start()

    slab = slabs_ref.at[buf]
    tco = out_ref.shape[-1]
    C = slab.shape[-1]
    if taps == 1:
        for k in range(9):
            dy, dx = k // 3, k % 3
            patch_ref[:, :, k * C:(k + 1) * C] = slab[dy:dy + TH, dx:dx + W]
        acc = jax.lax.dot_general(
            patch_ref[...], w3_ref[...].reshape(9 * C, tco),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    elif taps == 3:
        acc = jnp.zeros((TH, W, tco), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                patch_ref[:, :, dx * C:(dx + 1) * C] = (
                    slab[dy:dy + TH, dx:dx + W])
            acc = acc + jax.lax.dot_general(
                patch_ref[...], w3_ref[dy], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    else:
        w9 = w3_ref[...].reshape(9, C, tco)
        acc = jnp.zeros((TH, W, tco), jnp.int32)
        for k in range(9):
            dy, dx = k // 3, k % 3
            acc = acc + jax.lax.dot_general(
                slab[dy:dy + TH, dx:dx + W], w9[k], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    y = acc.astype(jnp.float32) * scale_ref[0][None, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
        y = y * oscale_ref[0, 0]                        # 1/out_scale
    out_ref[0] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("th", "act", "taps", "interpret"))
def conv3x3_s1_w8a8(x_padded, w, scale, out_scale=1.0, th=16, act=None,
                    taps=9, interpret=False):
    """int8 SAME 3x3 stride-1 conv with per-channel requantization.

    x_padded (B, H+2, W+2, C) int8; w (3, 3, C, Co) int8; scale (Co,) f32.
    act=None: out = q(acc * scale). act='silu': out =
    q(silu(acc * scale) / out_scale). Returns (B, H, W, Co) int8.
    H must be divisible by th.
    """
    B, Hp, Wp, C = x_padded.shape
    H, W = Hp - 2, Wp - 2
    Co = w.shape[-1]
    assert H % th == 0, (H, th)
    w3 = w.reshape(3, 3 * C, Co)
    tco = min(Co, 256)
    assert Co % tco == 0
    # Mosaic: a DMA-sliced memref's tiled dims must be whole-tile lengths —
    # the logical width (second-to-last dim, 8-sublane tiles) must be a
    # multiple of 8, so align it; the junk columns are never read (dx+W<=Wp).
    wp8 = -(-Wp // 8) * 8
    if wp8 != Wp:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, 0), (0, wp8 - Wp), (0, 0)))
        Wp = wp8
    inv_out = jnp.asarray(1.0 / out_scale, jnp.float32).reshape(1, 1)
    cot = Co // tco

    return pl.pallas_call(
        functools.partial(_kernel, th, H, W, act, taps, cot),
        grid=(B, H // th, cot),
        in_specs=[
            pl.BlockSpec((3, 3 * C, tco), lambda b, h, co: (0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tco), lambda b, h, co: (0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, h, co: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, W, tco),
                               lambda b, h, co: (b, h, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, Wp, C), jnp.int8),
            # taps=9 contracts ref slices directly; a token scratch keeps
            # the kernel signature uniform
            pltpu.VMEM((th, W, 9 * C) if taps == 1 else
                       (th, W, 3 * C) if taps == 3 else (8, 8, 128),
                       jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(w3, scale.reshape(1, Co), inv_out, x_padded)


def conv3x3_s1_w8a8_reference(x_padded, w, scale, out_scale=1.0, act=None):
    """XLA reference for parity tests: identical math, generic conv."""
    acc = jax.lax.conv_general_dilated(
        x_padded.astype(jnp.int32), w.astype(jnp.int32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale[None, None, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
        y = y / out_scale
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
