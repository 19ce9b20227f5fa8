"""Component-level timing of the fused inference path at the bench config
(b256 @640 bf16, flagship graph) — drives the round-2 MFU work.

Each stage is timed as its own jitted function with distinct input buffers and
a per-iteration host readback (honest-timing pattern from bench.py). Stages:

  enhance   lowlight_recovery only (pallas impl, as bench runs it)
  graph     full network forward, raw maps (includes enhance)
  decode    DFL decode + sigmoid from raw maps
  nms       fixed-shape NMS from decoded boxes/scores
  full      the bench graph end to end

Usage: python scripts/perf_breakdown.py [--batch 256] [--imgsz 640]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, args, iters=4, warmup=2):
    for i in range(warmup):
        out = fn(*args[i % len(args)])
        np.asarray(jax_leaf(out))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args[i % len(args)])
        np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / iters


def jax_leaf(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return x[(0,) * x.ndim] if hasattr(x, "ndim") and x.ndim else x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--imgsz", type=int, default=640)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.nn.heads import decode_detections
    from dedark_yolo_tpu.ops.nms import non_max_suppression

    b, s = args.batch, args.imgsz
    d = model_yaml_load("yolov8l.yaml")
    d["nc"] = 3
    model = DetectionModel(d, enhance_impl="pallas")
    variables = model.init(jax.random.PRNGKey(0), imgsz=s)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables["params"])
    bs = variables["batch_stats"]

    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))
            for _ in range(2)]

    @jax.jit
    def graph_fwd(params, bs, img_u8):
        x = img_u8.astype(jnp.bfloat16) / 255.0
        return model.module.apply({"params": params, "batch_stats": bs}, x,
                                  train=False)

    @jax.jit
    def full(params, bs, img_u8):
        raw = graph_fwd(params, bs, img_u8)
        boxes, scores = decode_detections(raw, model.nc, model.strides,
                                          model.reg_max)
        return non_max_suppression(boxes.astype(jnp.float32),
                                   scores.astype(jnp.float32),
                                   conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, max_nms=2048,
                                   multi_label=False)

    # enhance-only: apply just the lowlight module via a sliced graph
    from dedark_yolo_tpu.nn.enhance import LowlightRecovery
    enh = LowlightRecovery(impl="pallas")
    ev = enh.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, s, s, 3), jnp.bfloat16))

    @jax.jit
    def enhance_only(ep, img_u8):
        x = img_u8.astype(jnp.bfloat16) / 255.0
        return enh.apply({"params": ep}, x)

    eparams = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                     ev["params"])

    # decode+nms from captured raw maps
    raw0 = jax.tree_util.tree_map(lambda x: x, graph_fwd(params, bs, imgs[0]))
    raws = [raw0, graph_fwd(params, bs, imgs[1])]

    @jax.jit
    def decode_nms(raw):
        boxes, scores = decode_detections(raw, model.nc, model.strides,
                                          model.reg_max)
        return non_max_suppression(boxes.astype(jnp.float32),
                                   scores.astype(jnp.float32),
                                   conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, max_nms=2048,
                                   multi_label=False)

    t_full = timeit(full, [(params, bs, im) for im in imgs])
    t_graph = timeit(graph_fwd, [(params, bs, im) for im in imgs])
    t_enh = timeit(enhance_only, [(eparams, im) for im in imgs])
    t_dnms = timeit(decode_nms, [(r,) for r in raws])

    ips = b / t_full
    # FLOPs: YOLOv8l 165.7 GFLOP/img @640 (reference yaml doc) + ASFF/enhance
    flops_est = 190e9 * b
    print(f"batch {b} @ {s}px bf16:")
    print(f"  full fused   : {t_full * 1000:8.1f} ms  ({ips:.0f} img/s)")
    print(f"  graph fwd    : {t_graph * 1000:8.1f} ms")
    print(f"  enhance only : {t_enh * 1000:8.1f} ms")
    print(f"  decode+NMS   : {t_dnms * 1000:8.1f} ms")
    print(f"  backbone-ish : {(t_graph - t_enh) * 1000:8.1f} ms (graph - enhance)")
    print(f"  implied MFU  : {flops_est / t_full / 197e12 * 100:5.1f}% "
          f"(est 190 GFLOP/img, 197 TFLOP/s bf16 peak)")


if __name__ == "__main__":
    main()
