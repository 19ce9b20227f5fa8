import logging
import sys

LOGGER = logging.getLogger("dedark_yolo_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler(sys.stdout)
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.INFO)

from .metrics import (ap_per_class, compute_ap, match_predictions, ConfusionMatrix,
                      Metric, DetMetrics, smooth)
from .ema import ema_init, ema_update, ema_decay
from .checkpoint import save_checkpoint, load_checkpoint, restore_tree

__all__ = ["LOGGER", "ap_per_class", "compute_ap", "match_predictions",
           "ConfusionMatrix", "Metric", "DetMetrics", "smooth", "ema_init",
           "ema_update", "ema_decay", "save_checkpoint", "load_checkpoint",
           "restore_tree"]
