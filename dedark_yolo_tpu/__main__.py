"""CLI: `python -m dedark_yolo_tpu [task] mode k=v ...`

Counterpart of the reference `yolo TASK MODE k=v` entrypoint
(ultralytics/cfg/__init__.py:286-423): k=v override parsing with typo
suggestions, special commands (help/version/cfg), dispatch to the YOLO facade.
"""

from __future__ import annotations

import sys

from .cfg import DEFAULT_CFG_DICT, check_cfg_alignment, DEFAULT_CFG_KEYS
from .utils import LOGGER

MODES = ("train", "val", "predict", "export", "benchmark", "serve")
TASKS = ("detect",)

HELP = f"""dedark-yolo-tpu CLI

    python -m dedark_yolo_tpu MODE k=v ...

modes: {', '.join(MODES)}
examples:
    python -m dedark_yolo_tpu train model=yolov8l.yaml data=data.yaml epochs=5 imgsz=640 batch=4
    python -m dedark_yolo_tpu val model=runs/detect/train/weights/best.npz data=data.yaml
    python -m dedark_yolo_tpu predict model=best.npz source=images/ conf=0.4
    python -m dedark_yolo_tpu export model=best.npz format=stablehlo
    python -m dedark_yolo_tpu serve model=best.npz port=8080 batch=8
special:
    python -m dedark_yolo_tpu cfg        # print default config
    python -m dedark_yolo_tpu version
"""


def _parse_value(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v.lower() in ("none", "null", ""):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if v.startswith("[") and v.endswith("]"):
        inner = v[1:-1].strip()
        return [_parse_value(x.strip()) for x in inner.split(",")] if inner else []
    return v


def entrypoint(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("help", "-h", "--help"):
        print(HELP)
        return 0
    if argv[0] == "version":
        from . import __version__
        print(__version__)
        return 0
    if argv[0] == "cfg":
        import yaml
        print(yaml.safe_dump(DEFAULT_CFG_DICT, sort_keys=False))
        return 0

    mode = None
    overrides = {}
    for a in argv:
        if a in MODES:
            mode = a
        elif a in TASKS:
            continue
        elif "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = _parse_value(v)
        else:
            LOGGER.info(f"ignoring unrecognized argument '{a}' "
                        f"(expected MODE or k=v)")
    if mode is None:
        mode = overrides.pop("mode", "predict")
    serve_keys = {"port"} if mode == "serve" else set()
    check_cfg_alignment(set(DEFAULT_CFG_KEYS) | serve_keys, overrides)

    model_spec = overrides.pop("model", None) or "yolov8l.yaml"
    if mode == "serve":
        # dynamic-batching HTTP inference server (engine/server.py) — a
        # serving capability the reference does not have
        from .engine.server import InferenceServer
        import time
        srv = InferenceServer(
            model_spec,
            imgsz=int(overrides.get("imgsz", 640)),
            max_batch=int(overrides.get("batch", 8)),
            conf=float(overrides.get("conf", 0.25)),
            iou=float(overrides.get("iou", 0.7)),
            max_det=int(overrides.get("max_det", 300)),
            half=bool(overrides.get("half", False)))
        httpd, port = srv.serve(port=int(overrides.get("port", 8080)))
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            httpd.shutdown()
            srv.close()
        return 0

    from .engine.model import YOLO
    model = YOLO(model_spec)
    if mode == "train":
        model.train(**overrides)
    elif mode == "val":
        model.val(**overrides)
    elif mode == "predict":
        source = overrides.pop("source", None)
        if source is None:
            LOGGER.info("predict requires source=...")
            return 1
        results = model.predict(source, **{"save": True, **overrides})
        LOGGER.info(f"processed {len(results)} images")
    elif mode == "export":
        model.export(**overrides)
    elif mode == "benchmark":
        model.benchmark(**overrides)
    return 0


if __name__ == "__main__":
    raise SystemExit(entrypoint())
