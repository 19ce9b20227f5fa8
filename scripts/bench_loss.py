"""Isolate the TAL + detection-loss device cost at flagship train shapes.

The train roofline (scripts/roofline_train.py) attributes ~70-160 ms/step of
the b48/640 full step to everything past the raw head maps — the TAL
assignment plus the loss reductions (reference v8DetectionLoss loss.py:103-193
+ TaskAlignedAssigner tal.py:57-244). This benchmark times that slice alone:
grad of detection_loss wrt the raw maps, dummy maps/targets, so candidate
optimizations (pow->multiply chains, top-k one-hot fusion, dtype choices)
can be A/B'd in ~30 s instead of a 6-minute full-step recompile.

Usage: python scripts/bench_loss.py [--batch 48] [--imgsz 640] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--nc", type=int, default=3)
    ap.add_argument("--max-boxes", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--json-out", default="runs/bench_loss.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dedark_yolo_tpu.losses import detection_loss
    from dedark_yolo_tpu.losses.tal import task_aligned_assign
    from dedark_yolo_tpu.ops.anchors import make_anchors

    b, s, nc, m = args.batch, args.imgsz, args.nc, args.max_boxes
    strides = (8, 16, 32)
    no = 64 + nc
    rng = np.random.default_rng(0)
    raw = [jnp.asarray(rng.normal(0, 1, (b, s // st, s // st, no))
                       .astype(np.float32)) for st in strides]
    n_anchors = sum((s // st) ** 2 for st in strides)

    nb = 40  # real boxes per image
    cls = np.zeros((b, m), np.float32)
    cls[:, :nb] = rng.integers(0, nc, (b, nb))
    wh = rng.uniform(0.02, 0.3, (b, m, 2))
    cxy = rng.uniform(0.2, 0.8, (b, m, 2))
    bboxes = np.concatenate([cxy, wh], -1).astype(np.float32)
    mask = np.zeros((b, m), np.float32)
    mask[:, :nb] = 1.0
    batch = {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(bboxes),
             "mask_gt": jnp.asarray(mask),
             "recovery_loss": jnp.float32(0.01)}
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 0.01}

    def timeit(jf, tree_args, iters):
        t0 = time.perf_counter()
        out = jf(*tree_args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        compile_s = time.perf_counter() - t0
        # warm
        np.asarray(jax.tree_util.tree_leaves(jf(*tree_args))[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*tree_args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ms = (time.perf_counter() - t0) / iters * 1000
        return ms, compile_s

    results = {"batch": b, "imgsz": s, "nc": nc, "max_boxes": m,
               "n_anchors": n_anchors}

    # ---- loss grad wrt raw maps (the slice the train step pays) ------------
    def loss_total(maps):
        total, _ = detection_loss(maps, batch, nc=nc, strides=strides, hyp=hyp)
        return total

    # sum-reduce the grads on device: returning the raw (B,H,W,67) grad maps
    # would time a ~100 MB host transfer over the axon tunnel, not the chip
    def grad_scalar(maps):
        g = jax.grad(loss_total)(maps)
        return sum(jnp.sum(t) for t in g)

    jf = jax.jit(grad_scalar)
    ms, cs = timeit(jf, (raw,), args.iters)
    results["loss_grad_ms"] = round(ms, 2)
    results["loss_grad_compile_s"] = round(cs, 1)
    print(f"loss grad (TAL + reductions + bwd): {ms:.1f} ms", flush=True)

    # ---- loss forward only --------------------------------------------------
    jf = jax.jit(loss_total)
    ms, cs = timeit(jf, (raw,), args.iters)
    results["loss_fwd_ms"] = round(ms, 2)
    print(f"loss fwd only: {ms:.1f} ms", flush=True)

    # ---- TAL alone (stop-gradient region) -----------------------------------
    feat_shapes = [(s // st, s // st) for st in strides]
    anchor_points, stride_t = make_anchors(feat_shapes, strides, 0.5)
    scores = jnp.asarray(
        rng.uniform(0, 1, (b, n_anchors, nc)).astype(np.float32))
    pboxes = jnp.asarray(
        rng.uniform(0, s, (b, n_anchors, 4)).astype(np.float32))
    from dedark_yolo_tpu.ops.boxes import xywh2xyxy
    scale = jnp.asarray([s, s, s, s], jnp.float32)
    gtb = xywh2xyxy(batch["bboxes"] * scale) * batch["mask_gt"][..., None]

    def tal_only(sc, pb):
        r = task_aligned_assign(sc, pb, anchor_points * stride_t,
                                batch["cls"].astype(jnp.int32), gtb,
                                batch["mask_gt"], num_classes=nc)
        return r.target_scores.sum() + r.target_bboxes.sum()

    jf = jax.jit(tal_only)
    ms, cs = timeit(jf, (scores, pboxes), args.iters)
    results["tal_ms"] = round(ms, 2)
    print(f"TAL assignment alone: {ms:.1f} ms", flush=True)

    out = Path(args.json_out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
