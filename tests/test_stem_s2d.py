"""Space-to-depth stem rewrite (VERDICT r4 #1): exactness guarantees.

The rewrite (nn/layers.py ConvS2DOut/ConvS2DIn, nn/graph.py find_s2d_stem)
claims: identical parameter tree, identical init values, exact forward
algebra (fp32), exact train-mode BN statistics, matching gradients — so a
checkpoint trained either way loads into the other verbatim. These tests pin
each claim. Reference stem being rewritten: the first two Conv(k3 s2) rows
of ultralytics/cfg/models/v8/yolov8.yaml:19-24 (conv.py:38-55)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn.graph import DetectionModel, find_s2d_stem


def _models(with_enhance=False):
    if with_enhance:
        d = model_yaml_load(str(REPO / "tests" / "tiny_model.yaml"))
    else:
        d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8ori.yaml")
        d["scale"] = "n"
    d["nc"] = 3
    return DetectionModel(dict(d)), DetectionModel(dict(d), stem_s2d=True)


def test_param_tree_and_init_identical():
    m0, m1 = _models()
    assert find_s2d_stem(m1.specs, m1.save) == (0, 1)
    v0 = m0.init(jax.random.PRNGKey(0), imgsz=64)
    v1 = m1.init(jax.random.PRNGKey(0), imgsz=64)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_forward_exact():
    m0, m1 = _models()
    v = m0.init(jax.random.PRNGKey(1), imgsz=96)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 96, 96, 3)),
                    jnp.float32)
    b0, s0 = m0.apply_eval(v, x)
    b1, s1 = m1.apply_eval(v, x)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-6)


def test_train_stats_and_grads_match():
    """One train-mode forward: batch_stats updates bit-comparable (same
    element sets feed each BN channel) and parameter gradients match."""
    m0, m1 = _models()
    v = m0.init(jax.random.PRNGKey(2), imgsz=64)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)

    def loss(params, model):
        raw, new_stats = model.apply_train(
            {"params": params, "batch_stats": v["batch_stats"]}, x)
        return sum(jnp.sum(r ** 2) for r in raw), new_stats

    (l0, st0), g0 = jax.value_and_grad(loss, has_aux=True)(v["params"], m0)
    (l1, st1), g1 = jax.value_and_grad(loss, has_aux=True)(v["params"], m1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): l
             for k, l in jax.tree_util.tree_leaves_with_path(g1)}
    for k, a in flat0:
        b = flat1[jax.tree_util.keystr(k)]
        a = np.asarray(a)
        # tolerance scaled to the leaf's magnitude: the two convolutions
        # reduce in different orders, so fp32 rounding differs by ~1e-5 of
        # the leaf scale on a sum-of-squares loss (the algebra itself is
        # exact — see test_eval_forward_exact)
        atol = 2e-4 * max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(np.asarray(b), a, rtol=2e-3, atol=atol,
                                   err_msg=jax.tree_util.keystr(k))


def test_flagship_graph_with_enhance_layer():
    """The detector skips nothing when the stem sits behind
    lowlight_recovery (the dedark flagship layout)."""
    m0, m1 = _models(with_enhance=True)
    pair = find_s2d_stem(m1.specs, m1.save)
    assert pair is not None and m1.specs[pair[0]].name == "Conv"
    v = m0.init(jax.random.PRNGKey(3), imgsz=64)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    b0, s0 = m0.apply_eval(v, x)
    b1, s1 = m1.apply_eval(v, x)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-5, atol=1e-4)


def test_no_rewrite_when_pattern_absent():
    """Graphs whose first conv feeds more than the next layer (or non-k3s2
    stems) must build unchanged: find_s2d_stem returns None rather than
    producing wrong algebra."""
    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8ori.yaml")
    d["scale"] = "n"
    d["nc"] = 3
    d["backbone"][0] = [-1, 1, "Conv", [64, 3, 1]]  # s1: not a s2d candidate
    m = DetectionModel(dict(d), stem_s2d=True)
    assert find_s2d_stem(m.specs, m.save) is None
    m.init(jax.random.PRNGKey(0), imgsz=64)  # builds and runs
