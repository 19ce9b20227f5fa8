"""Configuration system.

Mirrors the reference's three-tier config (reference: ultralytics/cfg/__init__.py:97-145
``get_cfg`` merge + type-check, ultralytics/utils/__init__.py:144 IterableSimpleNamespace)
with the same key set as cfg/default.yaml, including the Dedark fork flags
(lowlight_FLAG, dark_param, dedark_FLAG, lrl).
"""

from __future__ import annotations

import difflib
import logging
from pathlib import Path
from types import SimpleNamespace

import yaml

CFG_DIR = Path(__file__).parent
DEFAULT_CFG_PATH = CFG_DIR / "default.yaml"

# Typed key sets, mirroring reference cfg/__init__.py:68-77.
CFG_FLOAT_KEYS = {
    "warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "dark_param", "lrl",
}
CFG_FRACTION_KEYS = {
    "dropout", "iou", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum",
    "warmup_bias_lr", "label_smoothing", "hsv_h", "hsv_s", "hsv_v", "translate",
    "scale", "perspective", "flipud", "fliplr", "mosaic", "mixup", "copy_paste",
    "conf", "fraction",
}
CFG_INT_KEYS = {
    "epochs", "patience", "batch", "workers", "seed", "close_mosaic", "mask_ratio",
    "max_det", "vid_stride", "line_width", "workspace", "nbs", "save_period",
    "max_boxes", "max_nms",
}
CFG_BOOL_KEYS = {
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
    "overlap_mask", "val", "save_json", "save_hybrid", "half", "plots", "show",
    "save_txt", "save_conf", "save_crop", "show_labels", "show_conf", "visualize",
    "augment", "agnostic_nms", "retina_masks", "boxes", "keras", "optimize", "int8",
    "dynamic", "simplify", "nms", "profile", "lowlight_FLAG", "dedark_FLAG",
    "save_enhanced", "photometric", "fuse",
}


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports iteration and dict-like access."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


def yaml_load(path) -> dict:
    with open(path, errors="ignore", encoding="utf-8") as f:
        data = yaml.safe_load(f.read()) or {}
    return data


def yaml_save(path, data: dict) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    clean = {k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


DEFAULT_CFG_DICT = yaml_load(DEFAULT_CFG_PATH)
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None
DEFAULT_CFG_KEYS = set(DEFAULT_CFG_DICT.keys())
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)


def check_cfg_alignment(base_keys, custom: dict) -> None:
    """Raise on unknown keys, suggesting near-misses (reference cfg/__init__.py:113)."""
    mismatched = [k for k in custom if k not in base_keys]
    if mismatched:
        msg = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, base_keys)
            hint = f" Did you mean {matches}?" if matches else ""
            msg.append(f"'{k}' is not a valid config key.{hint}")
        raise SyntaxError("\n".join(msg))


def _coerce(k, v):
    """Type-check and coerce one config entry (reference cfg/__init__.py:118-145)."""
    if v is None:
        return v
    if k in CFG_FLOAT_KEYS:
        if not isinstance(v, (int, float)):
            raise TypeError(f"'{k}={v}' must be a number")
        return float(v)
    if k in CFG_FRACTION_KEYS:
        if not isinstance(v, (int, float)):
            raise TypeError(f"'{k}={v}' must be a number")
        v = float(v)
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"'{k}={v}' must be in [0, 1]")
        return v
    if k in CFG_INT_KEYS:
        if not isinstance(v, int):
            if isinstance(v, float) and v.is_integer():
                return int(v)
            raise TypeError(f"'{k}={v}' must be an int")
        return v
    if k in CFG_BOOL_KEYS:
        if not isinstance(v, bool):
            raise TypeError(f"'{k}={v}' must be a bool")
        return v
    return v


def get_cfg(cfg=DEFAULT_CFG_DICT, overrides: dict | None = None) -> IterableSimpleNamespace:
    """Merge a base config with per-run overrides, type-checked.

    Reference: ultralytics/cfg/__init__.py:97-145 (get_cfg).
    """
    if isinstance(cfg, (str, Path)):
        cfg = yaml_load(cfg)
    elif isinstance(cfg, SimpleNamespace):
        cfg = vars(cfg)
    cfg = dict(cfg)
    if overrides:
        overrides = dict(overrides)
        # allow a nested 'cfg' file override
        sub = overrides.pop("cfg", None)
        if sub:
            cfg.update(yaml_load(sub))
        LOGGER = logging.getLogger("dedark_yolo_tpu")
        # deprecation shims (reference cfg/__init__.py:148-161): hide_* keys
        # invert into their show_* replacements
        for old, new in (("hide_labels", "show_labels"),
                         ("hide_conf", "show_conf")):
            if old in overrides:
                LOGGER.warning(f"'{old}' is deprecated — use '{new}' instead")
                v = overrides.pop(old)
                overrides[new] = not (v if isinstance(v, bool) else v != "False")
        if "line_thickness" in overrides:
            LOGGER.warning("'line_thickness' is deprecated — use 'line_width'")
            overrides["line_width"] = overrides.pop("line_thickness")
        check_cfg_alignment(DEFAULT_CFG_KEYS, overrides)
        cfg.update(overrides)
    for k, v in list(cfg.items()):
        if isinstance(v, str) and v.lower() == "none":
            v = None
        cfg[k] = _coerce(k, v)
    return IterableSimpleNamespace(**cfg)


def model_yaml_load(path) -> dict:
    """Load a model-architecture yaml, inferring the scale letter from the filename.

    Reference: ultralytics/nn/tasks.py:924-946 (yaml_model_load) — 'yolov8l.yaml'
    resolves to the unified 'yolov8.yaml' with scale 'l'.
    """
    import re

    path = Path(path)
    stem = path.stem
    m = re.search(r"v\d+([nslmx])", stem)
    scale = m.group(1) if m else ""
    unified = re.sub(r"(\d+)([nslmx])(.+)?$", r"\1\3", str(path))
    for candidate in (Path(unified), path, CFG_DIR / "models" / Path(unified).name,
                      CFG_DIR / "models" / path.name):
        if Path(candidate).is_file():
            d = yaml_load(candidate)
            d["scale"] = scale
            d["yaml_file"] = str(path)
            return d
    raise FileNotFoundError(f"model yaml not found: {path}")
