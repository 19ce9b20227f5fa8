"""Graph-builder shape tests: param counts vs the reference's documented numbers.

The reference yaml documents params/gradients per scale
(ultralytics/cfg/models/v8/yolov8.yaml:9-13). Our DFL decode is functional (no
frozen conv param), so our count equals the documented *gradients* count
(documented params minus the 16-entry frozen DFL weight)."""

import numpy as np
import jax
import pytest

from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn.graph import DetectionModel, parse_model

# documented gradient counts at nc=80 (yolov8.yaml comments minus DFL's 16)
EXPECTED = {"n": 3_157_184, "s": 11_166_544, "m": 25_902_624, "l": 43_691_504,
            "x": 68_229_632}


def _count_params(model, imgsz=64):
    shapes = jax.eval_shape(model.module.init, jax.random.PRNGKey(0),
                            jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), np.float32))
    return sum(int(np.prod(p.shape)) for p in
               jax.tree_util.tree_leaves(shapes["params"]))


@pytest.mark.parametrize("scale", ["n", "s", "m", "l", "x"])
def test_stock_yolov8_param_counts(scale):
    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8ori.yaml")
    d["scale"] = scale
    d["nc"] = 80
    m = DetectionModel(d)
    assert _count_params(m) == EXPECTED[scale]


def test_flagship_parses_at_l_scale():
    d = model_yaml_load("yolov8l.yaml")
    specs, save, head = parse_model(d)
    assert specs[0].name == "lowlight_recovery"
    assert head["strides"] == (8, 16, 32)
    assert head["ch"] == (256, 512, 512)
    # ASFF channel rules (tasks.py:892-896)
    asff = [s for s in specs if s.name == "AsffTribeLevel"]
    assert [s.c2 for s in asff] == [512, 512, 256]


def test_flagship_forward_shapes():
    """Tiny-image forward through the full dedark graph (L-scale channels)."""
    d = model_yaml_load("yolov8l.yaml")
    d["nc"] = 3
    m = DetectionModel(d)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out_shapes = jax.eval_shape(m.module.init, jax.random.PRNGKey(0),
                                jax.ShapeDtypeStruct(x.shape, np.float32))
    assert "params" in out_shapes and "batch_stats" in out_shapes


def test_rbf_asff_variant_parses():
    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8-rbf-asff.yaml")
    d["scale"] = "l"
    specs, save, head = parse_model(d)
    rfb = [s for s in specs if s.name == "RFBblock"]
    assert [s.c2 for s in rfb] == [256, 512, 512]
    assert head["strides"] == (32, 16, 8)[::-1] or head["strides"] == (8, 16, 32)


def test_stride_tracking_stock():
    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8ori.yaml")
    d["scale"] = "n"
    specs, save, head = parse_model(d)
    assert head["strides"] == (8, 16, 32)
    assert specs[9].stride == 32  # SPPF at P5


def test_conv2_and_fc_modules():
    import jax
    import jax.numpy as jnp
    from dedark_yolo_tpu.nn.layers import Conv2, FC
    x = jnp.zeros((1, 16, 16, 8))
    m = Conv2(c2=16)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 16, 16, 16)
    f = FC()
    vf = f.init(jax.random.PRNGKey(0), jnp.zeros((2, 32)))
    assert f.apply(vf, jnp.zeros((2, 32))).shape == (2, 6)


VARIANTS = ["yolov8-mfru-rbf-asff.yaml", "yolov8-faster.yaml",
            "yolov8-faster-twohead.yaml", "yolov8-p2.yaml", "yolov8-p6.yaml",
            "yolov8-rbf.yaml", "yolov8-cls.yaml", "yolov8-asff-threehead.yaml",
            "yolov8-pose-p6.yaml", "yolov8-rtdetr.yaml"]


@pytest.mark.parametrize("name", VARIANTS)
def test_variant_yamls_build(name):
    """Every shipped variant yaml parses and its graph initializes.

    ASFF/MFRU variants use the reference's hardcoded L-scale dims (the reference
    README warns these only fit the L scale), so they build at 'l'."""
    _build_variant(name, "l" if ("asff" in name or "twohead" in name) else "n")


@pytest.mark.parametrize("name", [n for n in VARIANTS
                                  if "asff" in n or "twohead" in n])
def test_asff_variants_build_at_n_scale(name):
    """Beyond-reference: ASFF dims derive from input channels (layers.py
    AsffTribeLevel), so the ASFF variants build at every scale token — the
    reference's hardcoded [512,512,256] only fits L (block.py:48-115)."""
    _build_variant(name, "n")


def _build_variant(name, scale):
    d = model_yaml_load(f"dedark_yolo_tpu/cfg/models/{name}")
    d["scale"] = scale
    m = DetectionModel(d)
    sz = 128 if "p6" in name else 64
    shapes = jax.eval_shape(m.module.init, jax.random.PRNGKey(0),
                            jax.ShapeDtypeStruct((1, sz, sz, 3), np.float32))
    assert "params" in shapes
    if "p6" in name:
        assert m.head["strides"] == (8, 16, 32, 64)
    if "p2" in name:
        assert m.head["strides"] == (4, 8, 16, 32)
    if "twohead" in name:
        assert len(m.head["strides"]) == 2
