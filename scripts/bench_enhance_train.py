"""Break down the enhance-stage train cost (fwd+bwd) at flagship shapes.

The round-4 train roofline (docs/BENCHMARKS.md) pins the lowlight_recovery
stage at 41 ms fwd+bwd at b48/640 — 4.5% of bf16 peak, the worst stage in the
step. Its FLOPs are almost all the dense 640x640 banded USM blur matmuls
(which at MXU speed would cost ~2 ms), so the wall time must sit in the
elementwise point-filter chain (pow/cos transcendentals + their backward)
or in a bad lowering. This probe times each slice alone so candidate fixes
(block-banded blur, pow-free VJP, dtype) can be A/B'd in ~1 min.

Slices timed (fwd and fwd+bwd, sum-reduced grads so nothing ships over the
tunnel): full LowlightRecovery, point filters alone, USM alone, a
block-banded USM variant, and the parameter CNN (resize+ExtractParameters2).

Usage: python scripts/bench_enhance_train.py [--batch 48] [--imgsz 640]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import lru_cache
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@lru_cache(maxsize=8)
def _banded_blocks(n: int, tile: int):
    """Split the (n, n) reflect-folded USM blur matrix into diagonal band
    blocks: K = n/tile blocks of (tile, tile + 24) acting on overlapping
    input slabs [k*tile - 12, (k+1)*tile + 12), clamped to [0, n) with the
    out-of-range taps already folded by reflection into in-range columns.

    Returns (starts, widths, blocks) with a single common slab width so the
    per-block einsum is one batched matmul.
    """
    from dedark_yolo_tpu.nn.enhance import _usm_blur_matrix

    dense = _usm_blur_matrix(n).astype(np.float64)
    assert n % tile == 0
    k = n // tile
    width = tile + 24
    starts, blocks = [], []
    for i in range(k):
        o0 = i * tile
        s0 = min(max(o0 - 12, 0), n - width)
        starts.append(s0)
        blocks.append(dense[o0:o0 + tile, s0:s0 + width])
        # everything outside the slab must be zero (reflection stays local
        # because 12 < tile); assert so a wrong slab never silently drops taps
        rest = dense[o0:o0 + tile].copy()
        rest[:, s0:s0 + width] = 0.0
        assert np.abs(rest).max() == 0.0, f"taps escape slab at block {i}"
    return np.asarray(starts), width, np.stack(blocks).astype(np.float32)


def usm_filter_banded(img, usm_param, tile=128):
    """usm_filter with the blur as K block-banded matmuls per axis instead of
    one dense (n, n) matmul — 4.2x fewer FLOPs at tile=128 (contraction width
    152 instead of 640). Same math: blocks are slices of the same
    reflect-folded matrix."""
    import jax.numpy as jnp
    from jax import lax
    from dedark_yolo_tpu.nn.enhance import gaussian_kernel_25

    def blur_axis(x, axis_len, axis):
        starts, width, blocks = _banded_blocks(axis_len, tile)
        B = jnp.asarray(blocks, x.dtype)  # (K, tile, width)
        if axis == 1:
            slabs = jnp.stack([lax.slice_in_dim(x, int(s), int(s) + width, axis=1)
                               for s in starts], axis=1)  # (b,K,width,W,C)
            out = jnp.einsum("koi,bkiwc->bkowc", B, slabs)
            b, k, t, w, c = out.shape
            return out.reshape(b, k * t, w, c)
        slabs = jnp.stack([lax.slice_in_dim(x, int(s), int(s) + width, axis=2)
                           for s in starts], axis=1)  # (b,K,H,width,C)
        out = jnp.einsum("koi,bkhic->bkhoc", B, slabs)
        b, k, h, t, c = out.shape
        return out.transpose(0, 2, 1, 3, 4).reshape(b, h, k * t, c)

    blur = blur_axis(img, img.shape[1], axis=1)
    blur = blur_axis(blur, img.shape[2], axis=2)
    return (img - blur) * usm_param[:, None, None, :] + img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--json-out", default="runs/bench_enhance_train.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dedark_yolo_tpu.nn.enhance import (
        ExtractParameters2, LowlightRecovery, apply_point_filters,
        regress_filter_params, torch_bilinear_resize, usm_filter)

    b, s = args.batch, args.imgsz
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (b, s, s, 3)), dt)
    feats = jnp.asarray(rng.normal(0, 1, (b, 15)), dt)

    mod = LowlightRecovery()
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3), dt))

    def timeit(jf, tree_args, iters):
        t0 = time.perf_counter()
        out = jf(*tree_args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        compile_s = time.perf_counter() - t0
        np.asarray(jax.tree_util.tree_leaves(jf(*tree_args))[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*tree_args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return (time.perf_counter() - t0) / iters * 1000, compile_s

    results = {"batch": b, "imgsz": s, "dtype": str(dt)}

    def bench(name, fn, fargs, grad_wrt=0):
        jf = jax.jit(fn)
        ms, cs = timeit(jf, fargs, args.iters)
        results[f"{name}_fwd_ms"] = round(ms, 2)
        print(f"{name:26s} fwd      {ms:7.1f} ms  (compile {cs:.0f}s)",
              flush=True)

        def scalar(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))

        def gsum(*a):
            g = jax.grad(scalar, argnums=grad_wrt)(*a)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(g))

        jf = jax.jit(gsum)
        ms, cs = timeit(jf, fargs, args.iters)
        results[f"{name}_fwdbwd_ms"] = round(ms, 2)
        print(f"{name:26s} fwd+bwd  {ms:7.1f} ms  (compile {cs:.0f}s)",
              flush=True)

    # full module (as the train graph sees it): grads wrt params AND image
    bench("enhance_full",
          lambda p, img: mod.apply(p, img), (params, x), grad_wrt=(0, 1))

    # parameter CNN alone (resize + ExtractParameters2)
    cnn = ExtractParameters2()
    cparams = cnn.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), dt))
    bench("param_cnn",
          lambda p, img: cnn.apply(p, torch_bilinear_resize(img, 256, 256)),
          (cparams, x), grad_wrt=(0, 1))

    # point-filter chain alone (fixed raw features -> params inside)
    def point_only(img, f):
        pr = regress_filter_params(f)
        A = jnp.full((img.shape[0], 3), 0.8, img.dtype)
        IcA = jnp.full((*img.shape[:3], 1), 0.5, img.dtype)
        return apply_point_filters(img, pr, A, IcA)

    bench("point_filters", point_only, (x, feats), grad_wrt=(0, 1))

    # USM alone: dense banded-matrix matmul vs block-banded
    usm_p = jnp.full((b, 1), 0.5, dt)
    bench("usm_dense", usm_filter, (x, usm_p), grad_wrt=(0, 1))
    for tile in (128, 320):
        ref = np.asarray(usm_filter(x.astype(jnp.float32),
                                    usm_p.astype(jnp.float32)))
        got = np.asarray(usm_filter_banded(x.astype(jnp.float32),
                                           usm_p.astype(jnp.float32), tile))
        err = float(np.abs(ref - got).max())
        results[f"usm_banded{tile}_maxerr_f32"] = err
        print(f"usm_banded tile={tile} f32 max|err| vs dense = {err:.2e}",
              flush=True)
        bench(f"usm_banded{tile}",
              lambda a, p, t=tile: usm_filter_banded(a, p, t),
              (x, usm_p), grad_wrt=(0, 1))

    out = Path(args.json_out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
