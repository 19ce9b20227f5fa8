"""FPN top-down fuse (VERDICT r4 #2): the upsample-commute through the
consuming 1x1 conv (nn/layers.py LazyUp + ConcatConv, nn/graph.py
find_fpn_fuse) is exact and checkpoint-identical. Reference pattern being
rewritten: Upsample/Concat/C2f head rows of
ultralytics/cfg/models/v8/yolov8.yaml."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn.graph import DetectionModel, find_fpn_fuse


def _models():
    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8ori.yaml")
    d["scale"] = "n"
    d["nc"] = 3
    return DetectionModel(dict(d)), DetectionModel(dict(d), fpn_fuse=True)


def test_plan_and_param_tree():
    m0, m1 = _models()
    assert find_fpn_fuse(m1.specs, m1.save) == (10, 13)  # both top-down ups
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


def test_train_mode_stats_and_grads():
    m0, m1 = _models()
    v = m0.init(jax.random.PRNGKey(2), imgsz=64)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)

    def loss(params, model):
        raw, new_stats = model.apply_train(
            {"params": params, "batch_stats": v["batch_stats"]}, x)
        return sum(jnp.mean(r ** 2) for r in raw), new_stats

    (l0, st0), g0 = jax.value_and_grad(loss, has_aux=True)(v["params"], m0)
    (l1, st1), g1 = jax.value_and_grad(loss, has_aux=True)(v["params"], m1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    for (ka, a), (kb, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        a = np.asarray(a)
        atol = 1e-5 * max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-4, atol=atol,
                                   err_msg=jax.tree_util.keystr(ka))


def test_composes_with_stem_s2d_and_remat():
    """All three graph rewrites coexist (the full perf configuration)."""
    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8ori.yaml")
    d["scale"] = "n"
    d["nc"] = 3
    m0 = DetectionModel(dict(d))
    m1 = DetectionModel(dict(d), fpn_fuse=True, stem_s2d=True, remat_upto=3)
    v = m0.init(jax.random.PRNGKey(3), imgsz=64)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    b0, s0 = m0.apply_eval(v, x)
    b1, s1 = m1.apply_eval(v, x)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-5, atol=1e-4)
    # train-mode grad through remat+LazyUp (pytree registration)
    raw, _ = m1.apply_train({"params": v["params"],
                             "batch_stats": v["batch_stats"]}, x)
    assert all(np.isfinite(np.asarray(r)).all() for r in raw)


import pytest


@pytest.mark.slow
def test_rewrites_under_spatial_mesh():
    """stem_s2d + fpn_fuse compile and produce finite grads on a 2x4
    data x spatial mesh (GSPMD halo exchange through the rewritten convs);
    loss matches the unrewritten graph."""
    from dedark_yolo_tpu.losses import detection_loss
    from dedark_yolo_tpu.parallel import make_mesh, shard_batch, replicate

    d = model_yaml_load(str(REPO / "tests" / "tiny_model.yaml"))
    losses = []
    for flags in ({}, {"stem_s2d": True, "fpn_fuse": True}):
        model = DetectionModel(dict(d), **flags)
        v = model.init(jax.random.PRNGKey(0), imgsz=64)
        mesh = make_mesh(shape=(2, 4), axes=("data", "spatial"))
        rng = np.random.default_rng(0)
        batch = {"img": rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8),
                 "bboxes": rng.uniform(0.3, 0.6, (2, 8, 4)).astype(np.float32),
                 "cls": rng.integers(0, 3, (2, 8)).astype(np.float32),
                 "mask_gt": np.ones((2, 8), np.float32)}

        def loss_fn(params, bs, b, model=model):
            img = b["img"].astype(jnp.float32) / 255.
            raw, _ = model.apply_train(
                {"params": params, "batch_stats": bs}, img)
            lb = {"cls": b["cls"], "bboxes": b["bboxes"],
                  "mask_gt": b["mask_gt"], "recovery_loss": jnp.zeros(())}
            t, _ = detection_loss(raw, lb, nc=model.nc, strides=model.strides,
                                  hyp={"box": 7.5, "cls": 0.5, "dfl": 1.5,
                                       "lrl": 2.0})
            return t

        p = replicate(mesh, v["params"])
        bs = replicate(mesh, v["batch_stats"])
        db = shard_batch(mesh, batch)
        total, g = jax.jit(jax.value_and_grad(loss_fn))(p, bs, db)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))
        losses.append(float(total))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-5)
