"""ASFF weight-branch commute equivalence (nn/layers.py AsffTribeLevel/
AsffDoubLevel `commute_weights`).

The optimization runs the 8/16-channel compress convs at PRE-upsample
resolution and nearest-upsamples the small output instead of the fat
feature map. Exact because 1x1 stride-1 conv + per-channel BN + pointwise
activation commute with integer nearest upsample. These tests assert:
  * identical param trees for both settings (checkpoint interchangeable),
  * forward equality in eval mode,
  * forward + batch-stats equality in train mode (batch statistics over the
    pixel-repeated multiset are unchanged),
  * gradient equality.

Reference: block.py:48-162 (ASFF / ASFF_2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dedark_yolo_tpu.nn import layers as L


def _tribe_inputs(s=32, b=2):
    rng = np.random.default_rng(7)
    shapes = [(b, s // 4, s // 4, 512), (b, s // 2, s // 2, 512),
              (b, s, s, 256)]
    return [jnp.asarray(rng.normal(size=sh).astype(np.float32))
            for sh in shapes]


@pytest.mark.slow
@pytest.mark.parametrize("level", [0, 1, 2])
def test_tribe_commute_matches_naive(level):
    xs = _tribe_inputs()
    fast = L.AsffTribeLevel(level=level, commute_weights=True)
    naive = L.AsffTribeLevel(level=level, commute_weights=False)
    v = fast.init(jax.random.PRNGKey(0), xs)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                naive.init(jax.random.PRNGKey(0), xs)))
    yf = fast.apply(v, xs)
    yn = naive.apply(v, xs)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yn),
                               rtol=1e-5, atol=1e-5)


def _assert_leafwise_close(ta, tb, rel=1e-4):
    """max|a-b| <= rel * max|b| per leaf (elementwise rtol is meaningless on
    near-zero entries of large accumulated gradients)."""
    for pa, pb in zip(jax.tree_util.tree_leaves(ta),
                      jax.tree_util.tree_leaves(tb)):
        a, b = np.asarray(pa), np.asarray(pb)
        scale = float(np.max(np.abs(b))) + 1e-9
        assert float(np.max(np.abs(a - b))) <= rel * scale


@pytest.mark.slow
@pytest.mark.parametrize("level", [1, 2])
def test_tribe_commute_train_mode_and_grads(level):
    xs = _tribe_inputs(s=16)
    fast = L.AsffTribeLevel(level=level, commute_weights=True)
    naive = L.AsffTribeLevel(level=level, commute_weights=False)
    v = fast.init(jax.random.PRNGKey(1), xs)

    def loss(params, mod):
        y, upd = mod.apply({"params": params,
                            "batch_stats": v["batch_stats"]}, xs,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(y ** 2), upd["batch_stats"]

    (lf, bsf), gf = jax.value_and_grad(loss, has_aux=True)(v["params"], fast)
    (ln, bsn), gn = jax.value_and_grad(loss, has_aux=True)(v["params"], naive)
    np.testing.assert_allclose(float(lf), float(ln), rtol=1e-5)
    _assert_leafwise_close(bsf, bsn)
    _assert_leafwise_close(gf, gn)


@pytest.mark.parametrize("level", [0, 1])
def test_doub_commute_matches_naive(level):
    rng = np.random.default_rng(3)
    s, b = 16, 2
    xs = [jnp.asarray(rng.normal(size=(b, s, s, 512)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(b, 2 * s, 2 * s, 256))
                      .astype(np.float32))]
    fast = L.AsffDoubLevel(level=level, commute_weights=True)
    naive = L.AsffDoubLevel(level=level, commute_weights=False)
    v = fast.init(jax.random.PRNGKey(0), xs)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                naive.init(jax.random.PRNGKey(0), xs)))
    yf = fast.apply(v, xs)
    yn = naive.apply(v, xs)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yn),
                               rtol=1e-5, atol=1e-5)
