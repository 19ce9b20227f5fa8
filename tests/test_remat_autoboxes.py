"""Selective layer remat (nn/graph.py remat_upto) and auto max_boxes.

remat_upto trades backward-pass HBM for recompute FLOPs on the early
high-resolution layers (the b64 @640 flagship step OOMs by ~170 MB without
it, runs/roofline_train_b64 analysis); it must be numerically invisible.
Auto max_boxes (cfg max_boxes=0) derives the static label-padding ceiling
from the dataset instead of a fixed 128 — the reference pads per-batch
dynamically (its collate_fn concatenates ragged labels), so a fixed ceiling
is the TPU static-shape price and must neither truncate dense mosaics nor
waste assigner work on sparse data.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))

from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn.graph import DetectionModel


def _tiny_model(remat_upto=-1):
    d = model_yaml_load(str(REPO / "tests" / "tiny_model.yaml"))
    return DetectionModel(d, nc=3, remat_upto=remat_upto)


def test_remat_matches_plain():
    """Gradients and batch_stats updates are identical with/without remat."""
    plain = _tiny_model(-1)
    remat = _tiny_model(4)
    v = plain.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))

    def loss(m):
        def f(p):
            raw, ns = m.apply_train({"params": p,
                                     "batch_stats": v["batch_stats"]}, x)
            return sum(jnp.sum(r.astype(jnp.float32) ** 2) for r in raw), ns
        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l1, ns1), g1 = loss(plain)
    (l2, ns2), g2 = loss(remat)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ns1),
                    jax.tree_util.tree_leaves(ns2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_remat_eval_unaffected():
    """remat_upto only fires under train=True; eval graphs are identical."""
    plain = _tiny_model(-1)
    remat = _tiny_model(99)
    v = plain.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.4
    b1, s1 = plain.apply_eval(v, x)
    b2, s2 = remat.apply_eval(v, x)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_auto_max_boxes_train(tmp_path):
    """max_boxes=0 resolves to the mosaic-aware top-k label-sum bound."""
    from synth import make_synth_dataset
    from dedark_yolo_tpu.engine.trainer import DetectionTrainer

    yp = make_synth_dataset(tmp_path / "ds", n_train=8, n_val=4, imgsz=64)
    tr = DetectionTrainer({
        "model": str(REPO / "tests" / "tiny_model.yaml"), "data": str(yp),
        "epochs": 1, "imgsz": 64, "batch": 4, "workers": 0, "max_boxes": 0,
        "mosaic": 1.0, "mixup": 0.0, "copy_paste": 0.0, "plots": False,
        "project": str(tmp_path / "runs"), "name": "amb", "exist_ok": True,
        "save": False, "val": False})
    tr._resolve_max_boxes()
    counts = sorted((len(lb) for lb in tr.train_ds.labels),
                    reverse=True)
    expect = int(np.clip(np.ceil(max(sum(counts[:4]), 1) / 8) * 8, 8, 1024))
    assert tr.args.max_boxes == expect
    assert tr.args.max_boxes % 8 == 0

    # explicit value is never overridden
    tr2 = DetectionTrainer({
        "model": str(REPO / "tests" / "tiny_model.yaml"), "data": str(yp),
        "max_boxes": 40, "plots": False, "save": False, "val": False,
        "project": str(tmp_path / "runs"), "name": "amb2", "exist_ok": True})
    tr2._resolve_max_boxes()
    assert tr2.args.max_boxes == 40


def test_auto_max_boxes_val(tmp_path):
    """Validator auto: densest val image rounded up to a multiple of 8."""
    from synth import make_synth_dataset
    from dedark_yolo_tpu.data import YOLODataset
    from dedark_yolo_tpu.engine.validator import resolve_val_max_boxes

    yp = make_synth_dataset(tmp_path / "ds", n_train=4, n_val=6, imgsz=64)
    import yaml
    d = yaml.safe_load(Path(yp).read_text())
    ds = YOLODataset(str(Path(d["path"]) / d["val"]), imgsz=64, nc=d["nc"])

    class A:
        max_boxes = 0
    resolve_val_max_boxes(A, ds)
    dens = max(len(lb) for lb in ds.labels)
    assert A.max_boxes == max(8, int(np.ceil(dens / 8) * 8))

    class B:
        max_boxes = 24
    resolve_val_max_boxes(B, ds)
    assert B.max_boxes == 24
