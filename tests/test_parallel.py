"""Mesh/sharding tests on the 8-virtual-device CPU platform."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dedark_yolo_tpu.parallel import make_mesh, shard_batch, replicate, batch_sharding


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(shape=(2,))
    assert mesh2.devices.size == 2


def test_shard_and_replicate():
    mesh = make_mesh()
    batch = {"img": np.zeros((8, 16, 16, 3), np.uint8),
             "cls": np.zeros((8, 4), np.float32)}
    dev = shard_batch(mesh, batch)
    sh = dev["img"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), ndim=dev["img"].ndim)
    params = {"w": jnp.ones((4, 4))}
    rep = replicate(mesh, params)
    assert rep["w"].sharding.is_fully_replicated


def test_grad_allreduce_semantics():
    """Params replicated + batch sharded: the grad equals the full-batch grad."""
    mesh = make_mesh()
    w = jnp.ones((4,))
    x = jnp.arange(32.0).reshape(8, 4)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, x)
    xd = jax.device_put(x, batch_sharding(mesh))
    wd = replicate(mesh, w)
    g_sharded = jax.jit(jax.grad(loss))(wd, xd)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-6)
    assert g_sharded.sharding.is_fully_replicated


@pytest.mark.slow
def test_multidevice_validation(tmp_path):
    """DetectionValidator shards val batches over a >1-device mesh and
    produces the same stats machinery as single-device (VERDICT round-1 #8)."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from synth import make_synth_dataset
    from dedark_yolo_tpu.cfg import get_cfg, DEFAULT_CFG_DICT, model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.engine.validator import DetectionValidator

    yaml_path = make_synth_dataset(tmp_path / "ds", n_train=4, n_val=8)
    d = model_yaml_load(str(Path(__file__).resolve().parent / "tiny_model.yaml"))
    model = DetectionModel(d, nc=3)
    v = model.init(jax.random.PRNGKey(0), imgsz=96)
    args = get_cfg(DEFAULT_CFG_DICT, {
        "data": str(yaml_path), "imgsz": 96, "batch": 8, "max_boxes": 16,
        "max_nms": 128, "max_det": 10, "rect": False, "plots": False,
        "workers": 2, "verbose": False})
    mesh = make_mesh()  # 8 virtual devices
    validator = DetectionValidator(args=args, save_dir=tmp_path / "val")
    metrics = validator(model=model, params=v["params"],
                        batch_stats=v["batch_stats"], mesh=mesh)
    assert "metrics/mAP50(B)" in metrics and "fitness" in metrics


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # asserts finite loss internally


def test_shard_batch_2d_specs():
    """On a data x spatial mesh, image leaves shard over BOTH axes (rows split
    spatially), label leaves over 'data' only; an image whose H does not
    divide the spatial axis falls back to batch-only sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(shape=(4, 2), axes=("data", "spatial"))
    batch = {"img": np.zeros((4, 64, 64, 3), np.uint8),
             "odd": np.zeros((4, 63, 63, 3), np.uint8),
             "cls": np.zeros((4, 5), np.float32),
             "bboxes": np.zeros((4, 5, 4), np.float32),
             # ndim-4 NON-image leaf (pose keypoints): dim 1 is instances,
             # not image rows — must stay batch-sharded despite divisibility
             "keypoints": np.zeros((4, 32, 17, 3), np.float32)}
    dev = shard_batch(mesh, batch)
    assert dev["keypoints"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=4)
    assert dev["img"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", "spatial")), ndim=4)
    assert dev["odd"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=4)
    assert dev["cls"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=2)
    assert dev["bboxes"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=3)


@pytest.mark.slow
def test_spatial_train_grad_parity():
    """Training fwd+bwd on a 2-D (data x spatial) mesh: GSPMD halo-exchanged
    convs in the DIFFERENTIATED graph produce the same loss and gradients as
    an unsharded single-device run (the mechanism dryrun_multichip validates,
    asserted numerically here)."""
    from pathlib import Path
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.parallel import replicate

    d = model_yaml_load(str(Path(__file__).parent / "tiny_model.yaml"))
    model = DetectionModel(d)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    params, bstats = v["params"], v["batch_stats"]
    img = np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)

    def loss(params, img):
        raw, _ = model.apply_train({"params": params, "batch_stats": bstats},
                                   img)
        return sum(jnp.mean(r ** 2) for r in raw)

    l_ref, g_ref = jax.value_and_grad(loss)(params, jnp.asarray(img))

    mesh = make_mesh(shape=(2, 2), axes=("data", "spatial"))
    dev = shard_batch(mesh, {"img": img})
    l_sh, g_sh = jax.jit(jax.value_and_grad(loss))(
        replicate(mesh, params), dev["img"])
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_sh = jax.tree_util.tree_leaves(g_sh)
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_spatial_sharded_inference():
    """One image's H axis sharded over all 8 devices: GSPMD partitions the
    convs (automatic halo exchange) and the result matches single-device
    inference — the large-image scaling axis of a CNN detector (SURVEY §5)."""
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.parallel import spatial_infer, spatial_pad_to

    d = model_yaml_load(str(Path(__file__).parent / "tiny_model.yaml"))
    model = DetectionModel(d)
    v = model.init(jax.random.PRNGKey(0), imgsz=256)
    img = np.random.default_rng(0).uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)

    ref_b, ref_s = model.apply_eval(v, jnp.asarray(img))
    assert spatial_pad_to(250, 8) == 256
    boxes, scores = spatial_infer(model, v, img)
    assert boxes.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_b),
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-5)
