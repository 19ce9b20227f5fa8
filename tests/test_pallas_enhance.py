"""Pallas fused enhance kernels vs the pure-JAX reference chain (interpret mode
on CPU; the same kernels compile with Mosaic on real TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from dedark_yolo_tpu.nn import enhance as E
from dedark_yolo_tpu.ops.pallas.enhance_kernel import (
    fused_enhance, fused_enhance_pallas, usm_pallas, _fits_full, _fits_usm)


def _inputs(b=2, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0.02, 0.98, (b, h, w, 3)).astype(np.float32)
    feats = rng.normal(0, 0.7, (b, 15)).astype(np.float32)
    A = rng.uniform(0.6, 0.9, (b, 3)).astype(np.float32)
    ica = rng.uniform(0.2, 0.8, (b, h, w, 1)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(feats), jnp.asarray(A), jnp.asarray(ica)


def test_full_kernel_matches_reference_chain():
    img, feats, A, ica = _inputs()
    want = np.asarray(E.apply_filter_chain(img, feats, A, ica))
    got = np.asarray(fused_enhance_pallas(img, feats, A, ica, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_full_kernel_default_priors():
    img, feats, _, _ = _inputs(seed=3)
    b, h, w, _ = img.shape
    A = jnp.full((b, 3), E.DEFAULT_A)
    ica = jnp.full((b, h, w, 1), E.DEFAULT_ICA)
    want = np.asarray(E.apply_filter_chain(img, feats, A, ica))
    got = np.asarray(fused_enhance_pallas(img, feats, A, ica, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_usm_kernel_matches():
    img, feats, A, ica = _inputs(seed=5)
    p = E.regress_filter_params(feats)
    y = E.apply_point_filters(img, p, A, ica)
    want = np.asarray(E.usm_filter(y, p["usm"]))
    got = np.asarray(usm_pallas(y, p["usm"], interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dispatch_matches_everywhere():
    img, feats, A, ica = _inputs(seed=7)
    want = np.asarray(E.apply_filter_chain(img, feats, A, ica))
    got = np.asarray(fused_enhance(img, feats, A, ica, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vmem_gates():
    from dedark_yolo_tpu.ops.pallas.enhance_kernel import _pick_tiles
    assert _fits_full(448, 448)
    # the streaming kernel (HBM-resident image, DMA'd column tiles) covers
    # 640 and beyond in both dtypes
    assert _fits_full(640, 640)
    assert _pick_tiles(640, 640, 2) == 1      # bf16: whole-width tile
    assert _pick_tiles(1280, 1280, 4) is not None
    assert _fits_usm(640, 640)
    assert not _fits_usm(2048, 2048)  # falls back to pure JAX


@pytest.mark.slow
def test_fused_enhance_diff_gradients_match_xla():
    """Custom-VJP pallas enhance: value from the kernel, grads identical to the
    XLA chain (training path uses this, VERDICT round-1 item on pallas-train)."""
    import jax
    from dedark_yolo_tpu.ops.pallas.enhance_kernel import fused_enhance_diff
    img, feats, A, ica = _inputs()

    def loss_pallas(img, feats):
        return jnp.sum(fused_enhance_diff(img, feats, A, ica, True) ** 2)

    def loss_xla(img, feats):
        return jnp.sum(E.apply_filter_chain(img, feats, A, ica) ** 2)

    v_p, g_p = jax.value_and_grad(loss_pallas, argnums=(0, 1))(img, feats)
    v_x, g_x = jax.value_and_grad(loss_xla, argnums=(0, 1))(img, feats)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=2e-5)
    for gp, gx in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_module_trains():
    """LowlightRecovery(impl='pallas') is differentiable end to end."""
    import jax
    module = E.LowlightRecovery(impl="pallas")
    img, _, A, ica = _inputs(b=1)
    v = module.init(jax.random.PRNGKey(0), img)

    def loss(params):
        out = module.apply({"params": params}, img, dedark_A=A, IcA=ica,
                           train=True)
        return jnp.mean((out - img) ** 2)

    g = jax.grad(loss)(v["params"])
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
