"""Runtime self-checks.

Counterparts of the reference's checks (ultralytics/utils/checks.py):
  - check_imgsz: round image size up to a stride multiple (checks.py:45) — the
    FPN concat shapes require imgsz % max_stride == 0;
  - check_bf16: fp32-vs-bf16 forward comparison before enabling amp
    (checks.py:393-441 check_amp runs the same fp32-vs-AMP numerics test).
"""

from __future__ import annotations

import math

import numpy as np

from . import LOGGER


def check_imgsz(imgsz, stride=32, min_dim=1, floor=0):
    """Round imgsz (int or [h, w]) UP to a multiple of stride."""
    if isinstance(imgsz, (list, tuple)):
        sz = [max(math.ceil(x / stride) * stride, floor) for x in imgsz]
        changed = list(imgsz) != sz
        out = sz if min_dim == 2 or len(sz) > 1 else sz[0]
    else:
        new = max(math.ceil(imgsz / stride) * stride, floor)
        changed = new != imgsz
        out = new
    if changed:
        LOGGER.info(f"imgsz {imgsz} is not a multiple of stride {stride}; "
                    f"updated to {out}")
    return out


def check_imshow(warn=False):
    """True when the environment can open cv2 display windows (reference
    checks.py:352-364). Probed in a SUBPROCESS: a GUI-less cv2/Qt stack can
    hard-abort the process on imshow (fatal, not a catchable cv2.error), so
    an in-process try/except — the reference's approach — would kill the
    caller exactly when the answer is 'no'."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import cv2, numpy as np;"
             "cv2.imshow('t', np.zeros((1, 1, 3), np.uint8));"
             "cv2.waitKey(1); cv2.destroyAllWindows(); cv2.waitKey(1)"],
            capture_output=True, timeout=20)
        ok = r.returncode == 0
    except Exception:
        ok = False
    if not ok and warn:
        LOGGER.warning("environment does not support cv2.imshow() — "
                       "show=True disabled")
    return ok


def check_bf16(model, params, batch_stats, imgsz=64, rtol=0.05):
    """Compare an fp32 vs bf16 forward; returns True if bf16 is numerically safe
    (mirrors the reference's check_amp fp32-vs-AMP comparison)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)),
                    jnp.float32)
    v32 = {"params": params, "batch_stats": batch_stats}
    boxes32, scores32 = model.apply_eval(v32, x)
    p16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
    boxes16, scores16 = model.apply_eval({"params": p16,
                                          "batch_stats": batch_stats},
                                         x.astype(jnp.bfloat16))
    s32 = np.asarray(scores32, np.float32)
    s16 = np.asarray(scores16, np.float32)
    err = float(np.abs(s32 - s16).max())
    ok = bool(err < rtol)
    if not ok:
        LOGGER.info(f"bf16 check failed: max score deviation {err:.4f} >= {rtol}")
    return ok
