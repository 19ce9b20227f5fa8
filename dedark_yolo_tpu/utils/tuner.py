"""Hyperparameter search.

Counterpart of reference ultralytics/utils/tuner.py:6-120 (run_ray_tune). Ray
is a GPU-cluster scheduler; on TPU the natural unit is sequential short
trainings on the chip, so this implements the same search space with an
evolve loop: a few random warmup trials, then each new candidate mutates a
fitness-weighted elite (per-gene mutation prob + lognormal-ish factor, clipped
to the reference bounds) — the same exploit/explore shape ASHA+ray delivers,
without a cluster scheduler. `strategy="random"` recovers plain random search.
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

_ELITES = 5          # parents drawn from the top-k by fitness
_MUT_PROB = 0.8      # per-gene mutation probability
_MUT_SIGMA = 0.2     # gaussian mutation scale (fraction of the bound range)


def _sample(space, rng):
    return {k: rng.uniform(*v) for k, v in space.items()}


def _mutate(parent, space, rng):
    """Mutate a parent config: each gene moves by N(0, sigma*range) with prob
    _MUT_PROB, clipped to the reference bounds; at least one gene mutates."""
    child = dict(parent)
    keys = list(space)
    mutated = False
    for k in keys:
        if rng.random() < _MUT_PROB:
            lo, hi = space[k]
            child[k] = min(max(parent[k] + rng.gauss(0.0, _MUT_SIGMA)
                               * (hi - lo), lo), hi)
            mutated = True
    if not mutated:  # degenerate draw: force one gene
        k = rng.choice(keys)
        lo, hi = space[k]
        child[k] = min(max(parent[k] + rng.gauss(0.0, _MUT_SIGMA)
                           * (hi - lo), lo), hi)
    return child


def _pick_parent(results, rng):
    """Fitness-weighted choice among the top elites. Successful trials with
    fitness exactly 0.0 (common on short probe budgets) still count as
    parents — only the -1.0 failure sentinel is excluded; the epsilon keeps
    the weighted draw defined when every elite scored 0.0."""
    elites = sorted((r for r in results if r["fitness"] >= 0),
                    key=lambda r: -r["fitness"])[:_ELITES]
    if not elites:
        return None
    weights = [r["fitness"] + 1e-6 for r in elites]
    return rng.choices(elites, weights=weights, k=1)[0]["cfg"]


def run_tune(model_yaml, data, space=None, trials=10, epochs_per_trial=5,
             seed=0, strategy="evolve", warmup_trials=3, **train_kwargs):
    """Tune hyperparameters; returns (best_cfg, results sorted by fitness).

    strategy: 'evolve' (default) mutates fitness-weighted elites after
    `warmup_trials` random probes; 'random' is plain random search.
    """
    from ..engine.model import YOLO

    space = dict(space or DEFAULT_SPACE)
    rng = random.Random(seed)
    results = []
    for t in range(trials):
        cfg = None
        if strategy == "evolve" and t >= warmup_trials:
            parent = _pick_parent(results, rng)
            if parent is not None:
                cfg = _mutate(parent, space, rng)
        if cfg is None:
            cfg = _sample(space, rng)
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
