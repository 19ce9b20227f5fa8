"""Microbenchmark the ASFF fusion levels on the real chip (roofline follow-up).

The round-3 roofline put "ASFF fusion x3" at 36% of bf16 peak (29.2 ms of a
~335 ms b256 step). This script isolates each AsffTribeLevel and its pieces:
per level it times (a) the full module and (b) only the expand 3x3 conv at
the level's resolution. The gap between (a) and (b) is everything the fusion
adds on top of the unavoidable expand conv: the weight branch (compress
convs + 3-ch conv + softmax), the resizes, and the fused weighted sum.

Honest-timing rules for the axon transport (docs/BENCHMARKS.md): a single jit
call runs `chain` applications via lax.scan over stacked inputs (amortizes the
~30 ms dispatch), inputs are pre-staged on device, every iteration reads back
a scalar, and an eps nudge makes each submission distinct.

Usage: python scripts/asff_bench.py [--batch 32] [--chain 8] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_FLOPS = 197e12  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (smoke tests; the axon "
                         "sitecustomize ignores JAX_PLATFORMS alone)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import linen as nn

    from dedark_yolo_tpu.nn import layers as L

    b, k = args.batch, args.chain
    s = args.imgsz
    # L-scale pyramid shapes at imgsz
    shapes = [(b, s // 32, s // 32, 512), (b, s // 16, s // 16, 512),
              (b, s // 8, s // 8, 256)]
    rng = np.random.default_rng(0)

    def staged(shape):
        return jax.device_put(jnp.asarray(
            rng.uniform(-1, 1, (k,) + shape).astype(np.float32))
            .astype(jnp.bfloat16))

    xs = [staged(sh) for sh in shapes]

    def timed(fn, *operands):
        """Time one jitted scan-chain; returns ms per chained application."""
        jf = jax.jit(fn)
        np.asarray(jf(*operands, jnp.bfloat16(0)))  # compile+warmup
        t0 = time.perf_counter()
        for i in range(args.iters):
            np.asarray(jf(*operands, jnp.bfloat16(1e-3 * (i + 1))))
        dt = (time.perf_counter() - t0) / args.iters
        return dt * 1000 / k

    results = {}
    for level in range(3):
        dim = [512, 512, 256][level]
        mod = L.AsffTribeLevel(level=level)
        v = mod.init(jax.random.PRNGKey(0),
                     [jnp.zeros(sh, jnp.bfloat16) for sh in shapes])
        v = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, v)

        def full(x0, x1, x2, eps, _v=v, _m=mod):
            def step(c, t):
                y = _m.apply(_v, [t[0] + eps, t[1] + eps, t[2] + eps])
                return c + jnp.sum(y.astype(jnp.float32)), ()
            out, _ = jax.lax.scan(step, jnp.float32(0), (x0, x1, x2))
            return out

        ms = timed(full, *xs)

        # (b) only the expand 3x3 conv at this level's resolution
        out_sh = shapes[level][:3] + (dim,)
        conv = L.AddConv(dim, 3, 1)
        xin = staged(out_sh)
        cv = conv.init(jax.random.PRNGKey(0), jnp.zeros(out_sh, jnp.bfloat16))
        cv = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, cv)

        def expand_only(x, eps, _v=cv, _m=conv):
            def step(c, t):
                return c + jnp.sum(_m.apply(_v, t + eps).astype(jnp.float32)), ()
            out, _ = jax.lax.scan(step, jnp.float32(0), x)
            return out

        ems = timed(expand_only, xin)
        gflop = (np.prod(out_sh) * dim * 9 * 2) / 1e9
        results[f"level{level}"] = {
            "full_ms": round(ms, 2), "expand_ms": round(ems, 2),
            "overhead_ms": round(ms - ems, 2),
            "expand_gflop": round(float(gflop), 1),
            # gflop [GFLOP] / ems [ms] = TFLOPS achieved; divide by peak TFLOPS
            "expand_pct_peak": round(
                float(gflop) / max(ems, 1e-9) / (PEAK_FLOPS / 1e12)
                * 100, 1),
        }
        print(f"level {level}: full {ms:.2f} ms  expand-conv {ems:.2f} ms "
              f"({results[f'level{level}']['expand_pct_peak']}% peak)  "
              f"overhead {ms - ems:.2f} ms  [per b{b} application]",
              flush=True)

    Path("runs").mkdir(exist_ok=True)
    Path("runs/asff_bench.json").write_text(json.dumps(
        {"batch": b, "chain": k, "imgsz": s, "levels": results}, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
