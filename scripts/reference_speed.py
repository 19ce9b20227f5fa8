"""Measure the REFERENCE stack's actual throughput on this host (VERDICT r3
next #3): bench.py's vs_baseline divides by an ASSUMED 100 img/s GPU stand-in
because the reference publishes no numbers; this grounds a second ratio in a
real measurement by running the full reference Dedark-YOLO (torch CPU, the
only backend available here) through its own DetectionValidator and predict
phase timers (reference validator.py:189, predictor.py:293-296 definitions)
at the flagship config (yolov8l + lowlight_recovery + ASFF, 640px, fp32 —
default.yaml:29 amp: False).

Writes runs/refspeed.json; bench.py picks it up to report
vs_measured_reference_cpu next to vs_assumed_gpu.

Usage: python scripts/reference_speed.py [--imgsz 640] [--n 16] [--scale l]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)  # reference default 3-4
    ap.add_argument("--scale", default="l")
    ap.add_argument("--model-yaml",
                    default="dedark_yolo_tpu/cfg/models/yolov8.yaml")
    ap.add_argument("--json-out", default="runs/refspeed.json")
    args = ap.parse_args()

    from ref_compat import import_reference
    ultra = import_reference()
    print(f"reference ultralytics {ultra.__version__} (torch CPU)")

    import torch
    import yaml as pyyaml
    from synth import make_synth_dataset

    from ultralytics.cfg import get_cfg
    from ultralytics.models.yolo.detect import (DetectionPredictor,
                                                DetectionValidator)
    from ultralytics.nn.tasks import DetectionModel as RefDetectionModel

    # dataset: synthetic 640px val images with labels (speed is content-
    # independent; the validator still runs its full metric pipeline)
    ds_root = REPO / "runs/refspeed/ds"
    ds_root.mkdir(parents=True, exist_ok=True)
    yp = make_synth_dataset(ds_root, n_train=2, n_val=args.n,
                            imgsz=args.imgsz)
    d = pyyaml.safe_load(Path(yp).read_text())
    d["path"] = str(ds_root)
    abs_yaml = REPO / "runs/refspeed/data_abs.yaml"
    abs_yaml.write_text(pyyaml.safe_dump(d, sort_keys=False))

    # flagship reference model (yolov8.yaml = lowlight_recovery + L backbone
    # + 3x AsffTribeLevel, reference cfg/models/v8/yolov8.yaml:18-52)
    cfg = pyyaml.safe_load(Path(args.model_yaml).read_text())
    cfg["scale"] = args.scale
    model = RefDetectionModel(cfg, ch=3, nc=d["nc"], verbose=False)
    model.names = {i: f"class{i}" for i in range(d["nc"])}
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference model: scale={args.scale} params={n_params:,}")

    torch.set_num_threads(max(1, __import__("os").cpu_count() or 1))

    # --- val phase (reference validator.py:93-207; speed at :189) ----------
    vargs = get_cfg(overrides=dict(
        data=str(abs_yaml), imgsz=args.imgsz, batch=args.batch, device="cpu",
        half=False, conf=0.001, iou=0.7, max_det=300, rect=False, plots=False,
        save_json=False, save_txt=False, save_hybrid=False, verbose=False,
        mode="val", task="detect"))
    v = DetectionValidator(save_dir=REPO / "runs/refspeed/val", args=vargs)
    t0 = time.perf_counter()
    v(model=model)
    val_wall = time.perf_counter() - t0
    val_speed = dict(v.speed)  # per-image ms: preprocess/inference/loss/post
    val_ms = sum(val_speed.values())
    val_ips = 1000.0 / val_ms if val_ms else None
    print(f"val: {val_speed} -> {val_ips:.2f} img/s "
          f"(wall {val_wall:.1f}s for {args.n} images)")

    # --- predict phase (reference predictor.py:247-330; speed :293-296) ----
    pargs = dict(model=None, conf=0.25, imgsz=args.imgsz, device="cpu",
                 half=False, save=False, verbose=False, mode="predict",
                 task="detect")
    predictor = DetectionPredictor(overrides=pargs)
    predictor.setup_model(model=model, verbose=False)
    val_dir = ds_root / "images" / "val"
    t0 = time.perf_counter()
    results = list(predictor.stream_inference(source=str(val_dir)))
    pred_wall = time.perf_counter() - t0
    pred_speed = {k: float(np.mean([r.speed[k] for r in results]))
                  for k in results[0].speed}
    pred_ms = sum(pred_speed.values())
    pred_ips = 1000.0 / pred_ms if pred_ms else None
    print(f"predict: {pred_speed} -> {pred_ips:.2f} img/s "
          f"(wall {pred_wall:.1f}s for {len(results)} images)")

    out = {
        "host": "this machine, torch CPU (only torch backend available)",
        "model": f"yolov8{args.scale} flagship (lowlight_recovery + ASFF)",
        "imgsz": args.imgsz, "batch": args.batch, "n_images": args.n,
        "fp32": True,
        "val_speed_ms_per_img": {k: round(float(x), 2)
                                 for k, x in val_speed.items()},
        "val_img_per_s": round(val_ips, 3),
        "predict_speed_ms_per_img": {k: round(float(x), 2)
                                     for k, x in pred_speed.items()},
        "predict_img_per_s": round(pred_ips, 3),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    out_p = REPO / args.json_out
    out_p.parent.mkdir(parents=True, exist_ok=True)
    out_p.write_text(json.dumps(out, indent=2))
    print(f"wrote {out_p}")


if __name__ == "__main__":
    main()
