"""Offline import shim for the reference Dedark-YOLO package.

The reference (/root/reference, read-only) needs four packages this image
does not ship: pkg_resources, easydict, thop (already guarded upstream), and
torchvision (only `ops.nms`, `transforms`, `models` attribute access on the
detect path). `install_stubs()` registers minimal stand-ins in sys.modules so
`import ultralytics` from the reference tree works offline; `import_reference()`
performs the path setup + import and returns the package.

The torchvision.ops.nms stand-in is a pure-torch greedy NMS with the same
semantics (descending score order, stable ties, strict `> iou` suppression —
torchvision docs + reference usage ops.py:261).
"""

from __future__ import annotations

import os
import sys
import types
from pathlib import Path

REFERENCE_ROOT = "/root/reference"


def _pkg_resources_stub():
    import packaging.requirements
    import packaging.version

    mod = types.ModuleType("pkg_resources")
    mod.parse_version = packaging.version.parse

    def parse_requirements(strs):
        if hasattr(strs, "read"):
            strs = strs.read()
        if isinstance(strs, str):
            strs = strs.splitlines()
        for line in strs:
            line = line.strip()
            if line and not line.startswith(("#", "-")):
                yield packaging.requirements.Requirement(line)

    class VersionConflict(Exception):
        pass

    class DistributionNotFound(Exception):
        pass

    def require(*_a, **_k):
        # the reference only uses this as a "is it importable" probe inside
        # try/except (checks.py:229); pretending success skips auto-pip
        return []

    mod.parse_requirements = parse_requirements
    mod.VersionConflict = VersionConflict
    mod.DistributionNotFound = DistributionNotFound
    mod.require = require
    return mod


def _easydict_stub():
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        """dict with attribute access (recursive), matching what
        filter_cfg.py:17-75 uses: attribute set/get of plain values."""

        def __init__(self, d=None, **kwargs):
            super().__init__()
            for k, v in {**(d or {}), **kwargs}.items():
                self[k] = v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod.EasyDict = EasyDict
    return mod


def _torchvision_stub():
    import torch

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.2"  # a version the reference's table knows

    ops = types.ModuleType("torchvision.ops")

    def nms(boxes, scores, iou_threshold):
        """Greedy NMS, torchvision semantics (reference ops.py:261)."""
        order = torch.argsort(scores, descending=True, stable=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            b = boxes[i]
            bs = boxes[rest]
            x1 = torch.maximum(b[0], bs[:, 0])
            y1 = torch.maximum(b[1], bs[:, 1])
            x2 = torch.minimum(b[2], bs[:, 2])
            y2 = torch.minimum(b[3], bs[:, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            area_b = (b[2] - b[0]) * (b[3] - b[1])
            area_r = (bs[:, 2] - bs[:, 0]) * (bs[:, 3] - bs[:, 1])
            iou = inter / (area_b + area_r - inter).clamp(min=1e-12)
            order = rest[iou <= iou_threshold]
        return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

    ops.nms = nms
    tv.ops = ops

    transforms = types.ModuleType("torchvision.transforms")

    def _unavailable(name):
        if name.startswith("__"):  # dunder probes (inspect, hasattr) pass through
            raise AttributeError(name)
        raise RuntimeError(
            f"torchvision.transforms.{name} is not available offline "
            "(classify-path only; the detect duel never reaches it)")

    transforms.__getattr__ = _unavailable
    tv.transforms = transforms

    models = types.ModuleType("torchvision.models")
    tv.models = models
    return tv, ops, transforms, models


def _cpuinfo_stub():
    mod = types.ModuleType("cpuinfo")
    mod.get_cpu_info = lambda: {"brand_raw": "offline-cpu"}
    return mod


def install_stubs():
    if "cpuinfo" not in sys.modules:
        try:
            import cpuinfo  # noqa: F401
        except ImportError:
            sys.modules["cpuinfo"] = _cpuinfo_stub()
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            sys.modules["pkg_resources"] = _pkg_resources_stub()
    if "easydict" not in sys.modules:
        try:
            import easydict  # noqa: F401
        except ImportError:
            sys.modules["easydict"] = _easydict_stub()
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv, ops, transforms, models = _torchvision_stub()
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.ops"] = ops
            sys.modules["torchvision.transforms"] = transforms
            sys.modules["torchvision.models"] = models


def import_reference(config_dir: str | Path = "runs/refduel/.config"):
    """Import the reference ultralytics package from /root/reference.

    Keeps the reference's import-time side effects inside the repo: its
    SettingsManager writes settings.yaml under YOLO_CONFIG_DIR
    (reference utils/__init__.py:584), so we point that at `config_dir`.
    Must be called before anything else imports an `ultralytics` module.
    """
    config_dir = Path(config_dir).resolve()
    config_dir.mkdir(parents=True, exist_ok=True)
    os.environ.setdefault("YOLO_CONFIG_DIR", str(config_dir))
    os.environ.setdefault("MPLCONFIGDIR", str(config_dir / "mpl"))
    # filter_cfg.py builds an argparse parser at import time that chokes on
    # foreign CLI args (SURVEY §5 config caveat) — hand it an empty argv
    argv, sys.argv = sys.argv, [sys.argv[0]]
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import ultralytics  # noqa: F401
    finally:
        sys.argv = argv
    assert Path(ultralytics.__file__).resolve().is_relative_to(REFERENCE_ROOT), (
        f"imported the wrong ultralytics: {ultralytics.__file__}")
    return ultralytics
