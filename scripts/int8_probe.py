"""int8 W8A8 conv probe: Pallas direct-matmul kernel vs XLA int8 vs bf16.

Round-2 measured XLA's int8 conv lowering at only 1.32x over bf16 (~33% of
the v5e's 394 int8 TOPS) and deferred the PTQ serving path on that number
(docs/BENCHMARKS.md). This probe decides whether the Pallas 9-tap matmul
formulation (ops/pallas/int8_conv.py) changes the verdict.

Protocol follows the axon honest-timing rules: a CHAIN of layers inside one
jit amortizes the ~30 ms per-call dispatch, distinct input buffers per
iteration defeat execution dedup, and a per-iteration device->host readback
is the only reliable completion barrier.

Usage: python scripts/int8_probe.py [--layers 24] [--iters 6] [--batch 32]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench(fn, inputs, iters, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(jax.block_until_ready(fn(inputs[i % len(inputs)]))[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(fn(inputs[i % len(inputs)])[0, 0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, default=80)
    ap.add_argument("--ch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dedark_yolo_tpu.ops.pallas.int8_conv import conv3x3_s1_w8a8

    B, H, C, L = args.batch, args.hw, args.ch, args.layers
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C), dtype=np.int8))
    wb = (w8.astype(jnp.bfloat16) / 127.0)
    # requant scale keeps the chain's int8 histogram roughly stationary:
    # acc ~ N(0, 9*C*(127/sqrt(3))^2) -> scale ~ 127/(3*sqrt(C))/73
    scale = jnp.full((C,), 127.0 / (np.sqrt(9 * C) * 73.0 * 127.0 / np.sqrt(3)),
                     jnp.float32)
    flops_per_layer = 2 * B * H * H * 9 * C * C

    # every chain includes the backbone's per-conv SiLU: bf16 fuses it, the
    # int8 paths dequantize -> silu -> requantize (XLA) or fuse it in-kernel
    # (Pallas act='silu') — the realistic quantized Conv+BN+SiLU block.
    @jax.jit
    def chain_bf16(x):
        for _ in range(L):
            y = jax.lax.conv_general_dilated(
                x, wb, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            x = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
        return x

    @jax.jit
    def chain_xla_int8(x):
        for _ in range(L):
            acc = jax.lax.conv_general_dilated(
                x, w8, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * scale[None, None, None, :]
            y = y * jax.nn.sigmoid(y) / 0.05
            x = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
        return x

    @jax.jit
    def chain_pallas_int8(x):
        for _ in range(L):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = conv3x3_s1_w8a8(xp, w8, scale, out_scale=0.05, th=16,
                                act="silu")
        return x

    xi8 = [jnp.asarray(rng.integers(-128, 127, (B, H, H, C), dtype=np.int8))
           for _ in range(3)]
    xbf = [(x.astype(jnp.bfloat16) / 127.0) for x in xi8]

    rows = []
    for name, fn, inputs, peak in (
            ("bf16 XLA conv", chain_bf16, xbf, 197e12),
            ("int8 XLA conv", chain_xla_int8, xi8, 394e12),
            ("int8 Pallas 9-tap matmul", chain_pallas_int8, xi8, 394e12)):
        dt = bench(fn, inputs, args.iters)
        tput = flops_per_layer * L / dt
        rows.append((name, dt, tput))
        print(f"{name:28s} {dt * 1e3:8.1f} ms/chain  {tput / 1e12:6.1f} "
              f"T{'OP' if 'int8' in name else 'FLOP'}/s  "
              f"({tput / peak * 100:4.1f}% of peak)")
    t_bf16 = rows[0][1]
    for name, dt, _ in rows[1:]:
        print(f"{name:28s} speedup vs bf16: {t_bf16 / dt:4.2f}x")


if __name__ == "__main__":
    main()
