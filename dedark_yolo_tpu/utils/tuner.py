"""Hyperparameter search.

Counterpart of reference ultralytics/utils/tuner.py:6-120 (run_ray_tune). Ray is
a GPU-cluster scheduler; on TPU the natural unit is sequential short trainings
on the chip, so this implements the same search space with random search +
fitness ranking (the reference's ASHA scheduler prunes by epoch; short fixed
budgets approximate that here).
"""

from __future__ import annotations

import random

from . import LOGGER

# reference tuner.py default space (bounds preserved)
DEFAULT_SPACE = {
    "lr0": (1e-5, 1e-1),
    "lrf": (0.01, 1.0),
    "momentum": (0.6, 0.98),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "box": (0.02, 0.2),
    "cls": (0.2, 4.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.9),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "lrl": (0.0, 5.0),   # fork's recovery-loss weight is tunable too
}


def run_tune(model_yaml, data, space=None, trials=10, epochs_per_trial=5,
             seed=0, **train_kwargs):
    """Random-search tune; returns (best_cfg, results list sorted by fitness)."""
    from ..engine.model import YOLO

    space = dict(space or DEFAULT_SPACE)
    rng = random.Random(seed)
    results = []
    for t in range(trials):
        cfg = {k: rng.uniform(*v) for k, v in space.items()}
        LOGGER.info(f"tune trial {t + 1}/{trials}: "
                    + ", ".join(f"{k}={v:.4g}" for k, v in cfg.items()))
        model = YOLO(model_yaml)
        try:
            metrics = model.train(data=data, epochs=epochs_per_trial,
                                  name=f"tune{t}", exist_ok=True,
                                  **cfg, **train_kwargs)
            fitness = float(metrics.get("fitness", 0.0))
        except Exception as e:  # a bad config must not kill the sweep
            LOGGER.info(f"trial {t} failed: {e}")
            fitness = -1.0
            metrics = {}
        results.append({"trial": t, "fitness": fitness, "cfg": cfg,
                        "metrics": dict(metrics)})
    results.sort(key=lambda r: -r["fitness"])
    best = results[0]
    LOGGER.info(f"best trial {best['trial']}: fitness {best['fitness']:.4f}")
    return best["cfg"], results
