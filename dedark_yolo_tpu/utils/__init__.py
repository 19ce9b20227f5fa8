import logging
import os
import sys

LOGGER = logging.getLogger("dedark_yolo_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler(sys.stdout)
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.INFO)


def _enable_persistent_compile_cache():
    """Point JAX at an on-disk compilation cache so fresh processes skip the
    multi-minute XLA compile of graphs they have built before (the remote
    compile service caches nothing across processes). Opt out with
    DEDARK_JAX_CACHE=0; best-effort — backends that cannot serialize
    executables simply keep compiling."""
    cache = os.environ.get(
        "DEDARK_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "dedark_jax"))
    if cache in ("0", ""):
        return
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # XLA:CPU AOT artifacts embed the COMPILING machine's feature set; a
        # remote compile service can hand back executables whose features the
        # local host lacks (SIGILL risk). TPU executables target the chip, not
        # the host, so the cache stays on for accelerator platforms.
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_enable_persistent_compile_cache()


def increment_dir(path, exist_ok=False):
    """runs/detect/predict -> runs/detect/predict2, 3, ... when the dir
    already exists (reference utils/files.py increment_path, used by every
    get_save_dir) so successive runs never mix artifacts."""
    from pathlib import Path
    path = Path(path)
    if path.exists() and not exist_ok:
        for i in range(2, 9999):
            cand = path.with_name(f"{path.name}{i}")
            if not cand.exists():
                return cand
    return path


def matmul_precision_wrap(fn, precision):
    """Wrap a (jitted) callable so it traces/executes under
    ``jax.default_matmul_precision(precision)``.

    The serving-precision knob (cfg key ``matmul_precision``): TPU MXUs
    compute f32 matmuls/convs with bf16 input passes by default — the source
    of the flagship duel's 0.0056 mAP50 delta (docs/PARITY.md). 'float32'
    forces fp32-accurate multi-pass matmuls, giving the reference's forced
    fp32-val guarantee (ref validator.py:106) on-chip at a measured
    throughput cost. 'default'/''/None return ``fn`` unwrapped. The precision
    config is part of jit's cache key, so wrapping each call is sound.
    """
    if not precision or str(precision) in ("default", "bfloat16"):
        return fn
    name = str(precision)
    if name == "highest":
        name = "float32"

    def wrapped(*a, **k):
        import jax
        with jax.default_matmul_precision(name):
            return fn(*a, **k)
    return wrapped


from .metrics import (ap_per_class, compute_ap, match_predictions,
                      match_from_iou, ConfusionMatrix, Metric, DetMetrics,
                      smooth)
from .ema import ema_init, ema_update, ema_decay
from .checkpoint import save_checkpoint, load_checkpoint, restore_tree

__all__ = ["LOGGER", "ap_per_class", "compute_ap", "match_predictions",
           "match_from_iou",
           "ConfusionMatrix", "Metric", "DetMetrics", "smooth", "ema_init",
           "ema_update", "ema_decay", "save_checkpoint", "load_checkpoint",
           "restore_tree", "matmul_precision_wrap"]
