"""Concat-elision equivalence: split-K 1x1 convs (layers.ConcatConv) must be
parameter-tree-identical and numerically equivalent to the materialized
jnp.concatenate path, so the same checkpoint runs with the flag on or off.

The elision removes the HBM write+read of concatenated activations feeding
1x1 convs (C2f/C3/SPPF inner concats + graph-level FPN Concat->C2f), which
the round-3 roofline flagged as the FPN top-down bandwidth sink."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn import layers as L
from dedark_yolo_tpu.nn.graph import DetectionModel, LazyConcat


@pytest.fixture(autouse=True)
def _restore_flag():
    prev = L.ELIDE_CONCAT
    yield
    L.set_concat_elision(prev)


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda p: (p.shape, str(p.dtype)), tree)


def _build(yaml_path, nc=3):
    d = model_yaml_load(yaml_path)
    d["nc"] = nc
    return DetectionModel(d)


@pytest.mark.parametrize("yaml_path", ["tests/tiny_model.yaml"])
def test_param_tree_identical(yaml_path):
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), np.float32)
    m = _build(yaml_path)
    L.set_concat_elision(True)
    on = jax.eval_shape(m.module.init, jax.random.PRNGKey(0), x)
    L.set_concat_elision(False)
    off = jax.eval_shape(m.module.init, jax.random.PRNGKey(0), x)
    assert _tree_shapes(on) == _tree_shapes(off)


@pytest.mark.slow
def test_forward_equivalence_tiny():
    m = _build("tests/tiny_model.yaml")
    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    L.set_concat_elision(False)
    v = m.module.init(jax.random.PRNGKey(0), x)
    ref = m.module.apply(v, x, train=False)
    L.set_concat_elision(True)
    out = m.module.apply(v, x, train=False)
    ref_l, out_l = jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
    assert len(ref_l) == len(out_l)
    for a, b in zip(ref_l, out_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_gradient_equivalence_tiny():
    """Training path: grads through the split-K contraction match the fused
    conv within accumulation rounding."""
    m = _build("tests/tiny_model.yaml")
    x = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    L.set_concat_elision(False)
    v = m.module.init(jax.random.PRNGKey(0), x)

    def loss(params, elide):
        L.set_concat_elision(elide)  # trace-time switch
        out, _ = m.module.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return sum(jnp.sum(jnp.square(o)) for o in jax.tree_util.tree_leaves(out))

    g_off = jax.grad(lambda p: loss(p, False))(v["params"])
    g_on = jax.grad(lambda p: loss(p, True))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_off),
                    jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


@pytest.mark.slow
def test_forward_equivalence_flagship():
    """Full dedark flagship graph (ASFF head, SPPF, FPN concats) at 64px."""
    m = _build("yolov8l.yaml")
    x = np.random.default_rng(2).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    L.set_concat_elision(False)
    v = m.module.init(jax.random.PRNGKey(0), x)
    ref = m.module.apply(v, x, train=False)
    L.set_concat_elision(True)
    out = m.module.apply(v, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_lazy_concat_densified_for_non_elidable_consumer():
    """A Concat whose consumer is a 3x3 conv must see a dense tensor."""
    a = jnp.ones((1, 4, 4, 2))
    b = jnp.zeros((1, 4, 4, 3))
    lc = LazyConcat([a, b])
    from dedark_yolo_tpu.nn.graph import _dense
    d = _dense(lc)
    assert d.shape == (1, 4, 4, 5)
    np.testing.assert_array_equal(np.asarray(d[..., :2]), np.ones((1, 4, 4, 2)))


def test_hgblock_elision_equivalence():
    """HGBlock's inner concat feeds a 1x1 conv; elided path must match."""
    x = np.random.default_rng(3).uniform(0, 1, (2, 16, 16, 32)).astype(np.float32)
    m = L.HGBlock(cm=24, c2=32, n=3, shortcut=True)
    L.set_concat_elision(False)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    L.set_concat_elision(True)
    v2 = m.init(jax.random.PRNGKey(0), x)
    assert _tree_shapes(v) == _tree_shapes(v2)
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-4, atol=2e-5)
