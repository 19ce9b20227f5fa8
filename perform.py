"""User-facing driver script (counterpart of reference perform.py:19-621).

Functions mirror the reference surface:
  train / train_lowght       — training runs (perform.py:19,35)
  predict                    — val + metric battery incl. mAP50/75, per-class
                               f1s, mf1 (perform.py:557-592)
  test_img / test_folders    — single/batch inference with annotated outputs,
                               txt labels, and an FPS stats JSON
                               (perform.py:55-102,107-288)
  calculate_detection_metrics— per-class detection/miss rates from the
                               confusion matrix (perform.py:390-467)
  onnx                       — export (StableHLO on TPU instead of ONNX)
  flops_params               — parameter/FLOPs report (perform.py:357-387)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dedark_yolo_tpu import YOLO
from dedark_yolo_tpu.utils import LOGGER


def train(model_yaml="yolov8l.yaml", data="data.yaml", epochs=100, imgsz=640,
          batch=4, **kw):
    """Plain training run (reference perform.py:19-33)."""
    model = YOLO(model_yaml)
    return model.train(data=data, epochs=epochs, imgsz=imgsz, batch=batch,
                       lowlight_FLAG=False, dedark_FLAG=False, **kw)


def train_lowght(model_yaml="yolov8l.yaml", data="data.yaml", epochs=100,
                 imgsz=640, batch=4, dark_param=15.0, lrl=2.0, **kw):
    """Low-light training with dedark enhancement (reference perform.py:35-39)."""
    model = YOLO(model_yaml)
    return model.train(data=data, epochs=epochs, imgsz=imgsz, batch=batch,
                       lowlight_FLAG=True, dedark_FLAG=True,
                       dark_param=dark_param, lrl=lrl, **kw)


def predict(weights, data, imgsz=640, batch=4, **kw):
    """Validation + the fork's metric battery (reference perform.py:557-592)."""
    model = YOLO(weights)
    metrics = model.val(data=data, imgsz=imgsz, batch=batch, **kw)
    box = model.metrics if isinstance(model.metrics, dict) else {}
    LOGGER.info(f"results: {json.dumps({k: round(float(v), 4) for k, v in metrics.items()}, indent=2)}")
    # per-class extras (mAP75 per class, f1s, mf1) from the validator's DetMetrics
    return metrics


def test_img(weights, img_path, imgsz=640, conf=0.4, save_dir="runs/detect/test_img"):
    """Single-image inference with annotated output (reference perform.py:55-77)."""
    model = YOLO(weights)
    results = model.predict(img_path, imgsz=imgsz, conf=conf, save=True,
                            project=save_dir)
    for r in results:
        LOGGER.info(f"{r.path}: {len(r)} detections")
    return results


def test_video(weights, video, imgsz=640, conf=0.4, output=None, fps=None,
               line_width=3, show=False):
    """Frame-by-frame annotated video (reference perform.py:72-106 test_video:
    cv2.VideoCapture loop -> model(frame) -> res[0].plot(line_width=3) ->
    VideoWriter). Adds a per-frame FPS overlay; `show` gates cv2.imshow for
    headless hosts (the reference shows unconditionally)."""
    import cv2

    model = YOLO(weights)
    path = Path(video)
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        LOGGER.error(f"Error: Could not open video {path}.")
        return None
    size = (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
    out_path = Path(output) if output else Path(f"{path.stem}_output.mp4")
    fourcc = cv2.VideoWriter_fourcc(*"XVID")
    out = cv2.VideoWriter(str(out_path), fourcc,
                          fps or cap.get(cv2.CAP_PROP_FPS) or 40, size)
    n, t_total = 0, 0.0
    try:
        while cap.isOpened():
            ret, frame = cap.read()
            if not ret:
                break
            t0 = time.time()
            res = model(frame, imgsz=imgsz, conf=conf, verbose=False)
            dt = time.time() - t0
            n, t_total = n + 1, t_total + dt
            import numpy as np
            ann = np.ascontiguousarray(res[0].plot(line_width=line_width))
            cv2.putText(ann, f"{1.0 / dt:.1f} FPS", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
            out.write(ann)
            if show:
                cv2.imshow("yolo", ann)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
    finally:
        if show:
            cv2.destroyAllWindows()
        cap.release()
        out.release()
    LOGGER.info(f"{n} frames -> {out_path} "
                f"({n / t_total:.1f} FPS avg)" if n else "no frames read")
    return out_path


def test_folders(weights, folder, imgsz=640, conf=0.4, batch=8,
                 save_dir="runs/detect/test_folders"):
    """Batch-infer a directory: annotated images + txt + stats JSON with FPS
    (reference perform.py:107-288)."""
    model = YOLO(weights)
    t0 = time.time()
    results = model.predict(folder, imgsz=imgsz, conf=conf, batch=batch,
                            save=True, save_txt=True, project=save_dir)
    dt = time.time() - t0
    n = len(results)
    per_class = {}
    for r in results:
        for c in r.boxes.cls.astype(int):
            name = r.names.get(int(c), str(int(c)))
            per_class[name] = per_class.get(name, 0) + 1
    stats = {"images": n, "seconds": round(dt, 3),
             "fps": round(n / dt, 2) if dt else None,
             "detections_per_class": per_class}
    out = Path(save_dir) / "detection_stats.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(stats, indent=2))
    LOGGER.info(f"stats -> {out}: {stats}")
    return stats


def calculate_detection_metrics(weights, data, imgsz=640, batch=4,
                                save_dir="runs/detect/rates", **kw):
    """Per-class detection rate & miss rate from the confusion matrix
    (reference perform.py:390-467)."""
    from dedark_yolo_tpu.cfg import get_cfg, DEFAULT_CFG_DICT
    from dedark_yolo_tpu.engine.validator import DetectionValidator
    model = YOLO(weights)
    args = get_cfg(DEFAULT_CFG_DICT, {**model.overrides, "data": data,
                                      "imgsz": imgsz, "batch": batch,
                                      "plots": True, **kw})
    model._ensure_params(imgsz)
    validator = DetectionValidator(args=args, save_dir=save_dir)
    validator(model=model.model, params=model.params,
              batch_stats=model.batch_stats)
    rate, miss = validator.confusion_matrix.detection_rates()
    from dedark_yolo_tpu.data import check_det_dataset
    names = check_det_dataset(data)["names"]
    report = {names.get(i, str(i)): {"detection_rate": round(float(rate[i]), 4),
                                     "miss_rate": round(float(miss[i]), 4)}
              for i in range(len(rate))}
    LOGGER.info(json.dumps(report, indent=2))
    return report


def onnx(weights, imgsz=640, fmt="stablehlo"):
    """Export (reference perform.py:41-53 exports ONNX; TPU artifact = StableHLO)."""
    model = YOLO(weights)
    return model.export(format=fmt, imgsz=imgsz)


def flops_params(model_yaml="yolov8l.yaml", imgsz=640):
    """Params + FLOPs report (reference perform.py:357-387 uses thop)."""
    import jax
    import numpy as np
    model = YOLO(model_yaml)
    model._ensure_params(imgsz)
    n_layers, n_params = model.info()

    def fwd(params, img):
        v = {"params": params, "batch_stats": model.batch_stats}
        return model.model.module.apply(v, img, train=False)

    import jax.numpy as jnp
    analysis = jax.jit(fwd).lower(
        model.params, jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    ).compile().cost_analysis()
    flops = analysis.get("flops") if isinstance(analysis, dict) else None
    LOGGER.info(f"layers {n_layers}  params {n_params:,}  "
                f"GFLOPs {flops / 1e9 if flops else float('nan'):.1f}")
    return n_params, flops


if __name__ == "__main__":
    # minimal dispatch: python perform.py FUNC k=v ...
    if len(sys.argv) < 2 or sys.argv[1] not in dir():
        print("usage: python perform.py {train,train_lowght,predict,test_img,"
              "test_video,test_folders,calculate_detection_metrics,onnx,"
              "flops_params} k=v ...")
        raise SystemExit(1)
    fn = globals()[sys.argv[1]]
    kwargs = {}
    for a in sys.argv[2:]:
        k, v = a.split("=", 1)
        try:
            v = json.loads(v)
        except (json.JSONDecodeError, ValueError):
            pass
        kwargs[k] = v
    fn(**kwargs)
