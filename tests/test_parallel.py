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


@pytest.mark.slow
def test_fused_vs_tree_train_step_parity_under_mesh():
    """The PRODUCTION flat-master fused train step (donated flat buffers,
    custom-VJP unflatten, fused SGD+EMA — engine/trainer.py:319-350) produces
    the same master params as the legacy treewise step when both run SHARDED
    on a 2-D (data x spatial) mesh. Guards the fused path's donation aliasing
    and sharding against the gate regression VERDICT r4 #5 named."""
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.losses import detection_loss
    from dedark_yolo_tpu.engine.optim import (
        flat_spec, flat_to_tree, flatten_for_opt, fused_ema_update,
        fused_init_opt_state, fused_opt_update_flat, init_opt_state,
        label_params, make_unflatten_diff, opt_update, tree_to_flat)
    from dedark_yolo_tpu.utils import ema_init, ema_update

    d = model_yaml_load(str(Path(__file__).parent / "tiny_model.yaml"))
    model = DetectionModel(d)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    params, bstats = v["params"], v["batch_stats"]
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    bspec = flat_spec(bstats)
    unflat = make_unflatten_diff(spec)
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 2.0}

    rng = np.random.default_rng(3)
    batch = {
        "img": rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8),
        "bboxes": rng.uniform(0.3, 0.6, (4, 8, 4)).astype(np.float32),
        "cls": rng.integers(0, 3, (4, 8)).astype(np.float32),
        "mask_gt": np.ones((4, 8), np.float32),
    }

    def loss_fn(params, batch_stats, b):
        img = b["img"].astype(jnp.float32) / 255.0
        raw, new_stats = model.apply_train(
            {"params": params, "batch_stats": batch_stats}, img)
        lbatch = {"cls": b["cls"], "bboxes": b["bboxes"],
                  "mask_gt": b["mask_gt"],
                  "recovery_loss": jnp.zeros(())}
        total, items = detection_loss(raw, lbatch, nc=model.nc,
                                      strides=model.strides, hyp=hyp)
        return total, (items, new_stats)

    okw = dict(kind="sgd", lr_bias=jnp.float32(0.02), lr=jnp.float32(0.01),
               momentum=jnp.float32(0.9), accumulate=1)

    def step_fused(pf, bs, st, ema, eu, b):
        (total, (_, new_stats)), gf = jax.value_and_grad(
            lambda f, s, bb: loss_fn(unflat(f), s, bb),
            has_aux=True)(pf, bs, b)
        pf, st, applied = fused_opt_update_flat(pf, gf, st, **okw)
        ep, eb, eu = fused_ema_update(ema["params"], ema["batch_stats"], pf,
                                      tree_to_flat(new_stats, bspec), eu,
                                      applied)
        return pf, new_stats, st, {"params": ep, "batch_stats": eb}, eu, total

    def step_tree(p, bs, st, ema, eu, b):
        (total, (_, new_stats)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, b)
        p, st, applied = opt_update(p, g, st, labels, **okw)
        cur = {"params": p, "batch_stats": new_stats}
        ema, eu = jax.lax.cond(applied, lambda t: ema_update(t[0], cur, t[1]),
                               lambda t: t, (ema, eu))
        return p, new_stats, st, ema, eu, total

    mesh = make_mesh(shape=(2, 2), axes=("data", "spatial"))
    dev_batch = shard_batch(mesh, batch)
    eu0 = jnp.zeros((), jnp.int32)

    # fused flat-master path, same donation contract as the trainer
    pf = replicate(mesh, tree_to_flat(params, spec))
    st_f = replicate(mesh, fused_init_opt_state(params, spec))
    ema_f = replicate(mesh, {"params": tree_to_flat(params, spec),
                             "batch_stats": tree_to_flat(bstats, bspec)})
    out_f = jax.jit(step_fused, donate_argnums=(0, 1, 2, 3))(
        pf, replicate(mesh, bstats), st_f, ema_f, eu0, dev_batch)

    # treewise path on the same mesh
    out_t = jax.jit(step_tree)(
        replicate(mesh, params), replicate(mesh, bstats),
        replicate(mesh, init_opt_state(params)),
        {"params": replicate(mesh, ema_init(params)),
         "batch_stats": replicate(mesh, ema_init(bstats))},
        eu0, dev_batch)

    np.testing.assert_allclose(float(out_f[-1]), float(out_t[-1]), rtol=1e-5)
    p_fused = flat_to_tree(out_f[0], spec)
    for a, b in zip(jax.tree_util.tree_leaves(out_t[0]),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
    ema_fused = flat_to_tree(out_f[3]["params"], spec)
    for a, b in zip(jax.tree_util.tree_leaves(out_t[3]["params"]),
                    jax.tree_util.tree_leaves(ema_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
