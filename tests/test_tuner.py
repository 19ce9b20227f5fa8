"""Hyperparameter tuner (utils/tuner.py): evolve-loop logic with a stubbed
trainer — the search machinery is asserted without paying for real trainings
(the reference has no tuner tests at all; its run_ray_tune needs a ray
cluster)."""

import numpy as np
import pytest

from dedark_yolo_tpu.utils import tuner
from dedark_yolo_tpu.utils.tuner import (DEFAULT_SPACE, _mutate, _pick_parent,
                                         _sample, run_tune)


def test_space_matches_reference_bounds():
    # reference tuner.py default_space bounds
    assert DEFAULT_SPACE["lr0"] == (1e-5, 1e-1)
    assert DEFAULT_SPACE["momentum"] == (0.6, 0.98)
    assert "lrl" in DEFAULT_SPACE  # fork's recovery weight is tunable


def test_mutate_respects_bounds():
    import random
    rng = random.Random(0)
    parent = _sample(DEFAULT_SPACE, rng)
    for _ in range(50):
        child = _mutate(parent, DEFAULT_SPACE, rng)
        assert child != parent  # at least one gene moved
        for k, (lo, hi) in DEFAULT_SPACE.items():
            assert lo <= child[k] <= hi


def test_pick_parent_prefers_fit_elites():
    import random
    rng = random.Random(0)
    results = [{"cfg": {"id": i}, "fitness": f}
               for i, f in enumerate([0.01, 0.9, -1.0, 0.5])]
    picks = [_pick_parent(results, rng)["id"] for _ in range(200)]
    assert 2 not in picks                      # failed trial never parents
    assert picks.count(1) > picks.count(0)     # weighted toward the fittest
    assert _pick_parent([{"cfg": {}, "fitness": -1.0}], rng) is None


def test_run_tune_evolves_with_stub(monkeypatch, tmp_path):
    """After the random warmup, candidates descend from the best elite: with a
    fitness function peaked at lr0 -> hi, the best found lr0 must beat the best
    random warmup draw."""
    calls = []

    class FakeYOLO:
        def __init__(self, spec):
            pass

        def train(self, data=None, epochs=None, name=None, exist_ok=None,
                  **cfg):
            calls.append(cfg)
            lo, hi = DEFAULT_SPACE["lr0"]
            return {"fitness": (cfg["lr0"] - lo) / (hi - lo)}

    import dedark_yolo_tpu.engine.model as em
    monkeypatch.setattr(em, "YOLO", FakeYOLO)

    best_cfg, results = run_tune("x.yaml", "d.yaml", trials=12,
                                 warmup_trials=3, seed=0)
    assert len(results) == 12 and len(calls) == 12
    warmup_best = max(r["fitness"] for r in results if r["trial"] < 3)
    assert results[0]["fitness"] >= warmup_best
    assert results[0]["cfg"]["lr0"] == pytest.approx(best_cfg["lr0"])
    # evolve beats pure random on the same budget and seed for this landscape
    _, rand_results = run_tune("x.yaml", "d.yaml", trials=12, seed=0,
                               strategy="random")
    assert results[0]["fitness"] >= rand_results[0]["fitness"]


def test_run_tune_survives_failing_trials(monkeypatch):
    class ExplodingYOLO:
        def __init__(self, spec):
            pass

        def train(self, **kw):
            raise RuntimeError("boom")

    import dedark_yolo_tpu.engine.model as em
    monkeypatch.setattr(em, "YOLO", ExplodingYOLO)
    best_cfg, results = run_tune("x.yaml", "d.yaml", trials=3, seed=0)
    assert len(results) == 3
    assert all(r["fitness"] == -1.0 for r in results)
    assert best_cfg  # still returns a config
