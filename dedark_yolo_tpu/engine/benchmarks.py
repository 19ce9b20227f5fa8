"""Benchmark harness (counterpart of ultralytics/utils/benchmarks.py:47-149).

The reference exports to every GPU/mobile format and vals each; for the TPU
stack the relevant axes are precision (fp32/bf16) and batch size on the chip.
Produces a table of throughput (and mAP when a dataset is provided)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOGGER


def benchmark(yolo, imgsz=640, data=None, batch_sizes=(1, 8, 32), warmup=2,
              iters=5, **kwargs):
    from ..nn.heads import decode_detections
    from ..ops.nms import non_max_suppression

    model = yolo.model
    yolo._ensure_params(imgsz)
    rows = []
    for half in (False, True):
        dtype = jnp.bfloat16 if half else jnp.float32
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype in (jnp.float32, jnp.bfloat16)
            else x, yolo.params)

        for bs in batch_sizes:
            @jax.jit
            def fused(params, batch_stats, img_u8):
                img = img_u8.astype(dtype) / 255.0
                v = {"params": params, "batch_stats": batch_stats}
                raw = model.module.apply(v, img, train=False)
                if model.head["name"] == "RTDETRDecoder":
                    scale = jnp.asarray([imgsz, imgsz, imgsz, imgsz], raw.dtype)
                    boxes, scores = raw[..., :4] * scale, raw[..., 4:]
                else:
                    boxes, scores = decode_detections(
                        raw, model.nc, model.strides, model.reg_max)
                return non_max_suppression(boxes.astype(jnp.float32),
                                           scores.astype(jnp.float32),
                                           conf_thres=0.25, iou_thres=0.45,
                                           max_det=300, max_nms=2048,
                                           multi_label=False)

            # distinct input buffers + a device->host readback per iteration:
            # some remote-device transports dedupe identical executions and
            # return from block_until_ready early, inflating throughput >10x
            # (same honest-timing pattern as bench.py)
            rng = np.random.default_rng(0)
            imgs = [jnp.asarray(rng.integers(0, 255, (bs, imgsz, imgsz, 3),
                                             dtype=np.uint8))
                    for _ in range(min(iters, 4))]
            try:
                for i in range(warmup):
                    _, counts = fused(params, yolo.batch_stats,
                                      imgs[i % len(imgs)])
                    np.asarray(counts)
                # depth-2 pipelining: submit batch i+1 before reading back
                # batch i (hides per-call dispatch latency; every output is
                # still read back, so the timing stays honest — bench.py)
                t0 = time.perf_counter()
                pending = None
                for i in range(iters):
                    out = fused(params, yolo.batch_stats, imgs[i % len(imgs)])
                    if pending is not None:
                        np.asarray(pending[1])
                    pending = out
                np.asarray(pending[1])
                dt = time.perf_counter() - t0
                ips = bs * iters / dt
                rows.append({"precision": "bf16" if half else "fp32",
                             "batch": bs, "img_per_sec": round(ips, 2),
                             "ms_per_img": round(1000 / ips, 3)})
                LOGGER.info(f"bench {'bf16' if half else 'fp32'} bs={bs}: "
                            f"{ips:.1f} img/s")
            except Exception as e:
                rows.append({"precision": "bf16" if half else "fp32",
                             "batch": bs, "error": str(e)[:100]})
    if data is not None:
        metrics = yolo.val(data=data, imgsz=imgsz, **kwargs)
        rows.append({"mAP50-95": metrics.get("metrics/mAP50-95(B)")})
    return rows


def benchmark_formats(yolo, imgsz=640, data=None, batch=8, warmup=1, iters=3,
                      formats=("live", "bin", "tflite", "saved_model"),
                      export_dir=None, **kwargs):
    """Export the model to each deployment format and measure each one —
    size, throughput, and (with `data`) mAP — like the reference
    `benchmark()` (utils/benchmarks.py:47-149), which exports every format
    and vals each through AutoBackend. 'live' is the un-exported model.

    Returns a list of row dicts; formats whose toolchain is unavailable
    report an error string instead of failing the whole table.
    """
    import tempfile
    from pathlib import Path
    from .autobackend import AutoBackend

    if getattr(yolo, "_backend_spec", None):
        raise ValueError(
            "benchmark(formats=True) needs a live model (yaml/npz spec) to "
            "export from; this YOLO wraps an already-exported artifact")
    export_dir = Path(export_dir or tempfile.mkdtemp(prefix="dedark_bench_"))
    yolo._ensure_params(imgsz)
    rng = np.random.default_rng(0)
    imgs = [np.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3),
                                    dtype=np.uint8))
            for _ in range(min(iters, 4))]
    rows = []
    for fmt in formats:
        try:
            if fmt == "live":
                spec = yolo.ckpt_path or yolo.overrides.get("model")
                backend, size_mb = AutoBackend(spec, imgsz=imgsz,
                                               batch=batch), None
            else:
                path = yolo.export(format=fmt, imgsz=imgsz, batch=batch,
                                   project=str(export_dir / fmt))
                p = Path(path)
                size = (sum(f.stat().st_size for f in p.rglob("*") if
                            f.is_file()) if p.is_dir() else p.stat().st_size)
                size_mb = round(size / 1e6, 2)
                backend = AutoBackend(path)
            for i in range(warmup):
                np.asarray(backend.forward(imgs[i % len(imgs)])[0])
            t0 = time.perf_counter()
            for i in range(iters):
                np.asarray(backend.forward(imgs[i % len(imgs)])[0])
            dt = time.perf_counter() - t0
            ips = batch * iters / dt
            row = {"format": fmt, "size_mb": size_mb,
                   "img_per_sec": round(ips, 2)}
            if data is not None:
                from .model import YOLO
                m = yolo if fmt == "live" else YOLO(path)
                metrics = m.val(data=data, imgsz=imgsz, batch=batch, **kwargs)
                row["mAP50-95"] = metrics.get("metrics/mAP50-95(B)")
            rows.append(row)
            LOGGER.info(f"benchmark_formats {fmt}: {row}")
        except Exception as e:
            rows.append({"format": fmt, "error": str(e)[:120]})
            LOGGER.warning(f"benchmark_formats {fmt} failed: {e}")
    return rows
