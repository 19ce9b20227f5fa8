"""Golden tests for the lowlight_recovery filter math against the reference
formulas (ultralytics/nn/modules/filtersB.py), computed independently in numpy."""

import numpy as np
import jax
import jax.numpy as jnp

from dedark_yolo_tpu.nn import enhance as E


def rng_img(b=2, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.05, 0.95, size=(b, h, w, 3)).astype(np.float32)


def test_tanh_range():
    x = np.linspace(-3, 3, 7).astype(np.float32)
    got = np.asarray(E.tanh_range(jnp.asarray(x), 0.1, 1.0))
    want = np.tanh(x) * (1.0 - 0.1) / 2 + (1.0 + 0.1) / 2
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.min() > 0.1 and got.max() < 1.0


def test_zero_features_near_identity_except_dedark():
    """With raw features = 0: wb scale ~1, gamma = 1, contrast p = 0, usm s = 2.5,
    dedark w = 0.55 — so only dedark + usm transform the image."""
    img = rng_img()
    feats = jnp.zeros((2, 15), jnp.float32)
    p = E.regress_filter_params(feats)
    np.testing.assert_allclose(np.asarray(p["gamma"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["contrast"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["dedark_w"]), 0.55, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["usm"]), 2.5, atol=1e-6)
    # wb: exp(0)=1 normalized by 1.00001
    np.testing.assert_allclose(np.asarray(p["wb"]), 1.0 / 1.00001, atol=1e-5)


def test_dedark_filter_formula():
    img = rng_img()
    A = np.full((2, 3), 0.8, np.float32)
    IcA = np.full((2, 16, 16, 1), 0.5, np.float32)
    w = np.full((2, 1), 0.7, np.float32)
    params = {"dedark_w": jnp.asarray(w), "wb": jnp.ones((2, 3)),
              "gamma": jnp.ones((2, 1)), "contrast": jnp.zeros((2, 1)),
              "usm": jnp.zeros((2, 1))}
    out = np.asarray(E.apply_point_filters(jnp.asarray(img), params,
                                           jnp.asarray(A), jnp.asarray(IcA)))
    tx = np.maximum(1 - 0.7 * 0.5, 0.01)
    want = (img - 0.8) / tx + 0.8
    # wb=1 and gamma=1 leave values; contrast p=0 is identity; but gamma clips at 1e-4
    want = np.power(np.maximum(want, 1e-4), 1.0)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_gamma_filter():
    img = rng_img()
    params = {"dedark_w": jnp.zeros((2, 1)), "wb": jnp.ones((2, 3)),
              "gamma": jnp.full((2, 1), 2.0), "contrast": jnp.zeros((2, 1)),
              "usm": jnp.zeros((2, 1))}
    A = jnp.zeros((2, 3))
    IcA = jnp.zeros((2, 16, 16, 1))
    out = np.asarray(E.apply_point_filters(jnp.asarray(img), params, A, IcA))
    np.testing.assert_allclose(out, np.power(img, 2.0), rtol=1e-4, atol=1e-5)


def test_contrast_filter_formula():
    img = rng_img()
    p = 0.5
    params = {"dedark_w": jnp.zeros((2, 1)), "wb": jnp.ones((2, 3)),
              "gamma": jnp.ones((2, 1)), "contrast": jnp.full((2, 1), p),
              "usm": jnp.zeros((2, 1))}
    out = np.asarray(E.apply_point_filters(
        jnp.asarray(img), params, jnp.zeros((2, 3)), jnp.zeros((2, 16, 16, 1))))
    lum = np.clip(0.27 * img[..., 0] + 0.67 * img[..., 1] + 0.06 * img[..., 2], 0, 1)[..., None]
    clum = -np.cos(np.pi * lum) * 0.5 + 0.5
    cimg = img / (lum + 1e-6) * clum
    want = (1 - p) * img + p * cimg
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-4)


def test_gaussian_kernel_normalized():
    k = E.gaussian_kernel_25()
    assert k.shape == (25,)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)
    assert np.argmax(k) == 12


def test_usm_zero_param_identity():
    img = rng_img()
    out = np.asarray(E.usm_filter(jnp.asarray(img), jnp.zeros((2, 1))))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_usm_sharpens():
    """USM with s>0 must amplify an impulse's center value."""
    img = np.full((1, 33, 33, 3), 0.5, np.float32)
    img[0, 16, 16, :] = 1.0
    out = np.asarray(E.usm_filter(jnp.asarray(img), jnp.full((1, 1), 2.0)))
    assert out[0, 16, 16, 0] > 1.0
    # far corner untouched by the 25-tap kernel
    np.testing.assert_allclose(out[0, 0, 0], 0.5, atol=1e-3)


def test_usm_separable_matches_dense_2d():
    """Two 1-D passes == one dense 25x25 conv (the reference's formulation)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(1, 40, 40, 3)).astype(np.float32)
    s = np.full((1, 1), 1.5, np.float32)
    got = np.asarray(E.usm_filter(jnp.asarray(img), jnp.asarray(s)))
    k1 = E.gaussian_kernel_25().astype(np.float64)
    k2 = np.outer(k1, k1)
    pad = 12
    blurred = np.empty_like(img)
    padded = np.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    for c in range(3):
        for i in range(40):
            for j in range(40):
                blurred[0, i, j, c] = np.sum(padded[0, i:i + 25, j:j + 25, c] * k2)
    want = (img - blurred) * 1.5 + img
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_lowlight_recovery_module_runs():
    img = jnp.asarray(rng_img(b=1, h=64, w=64))
    mod = E.LowlightRecovery()
    variables = mod.init(jax.random.PRNGKey(0), img)
    out = mod.apply(variables, img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    # defaults path must brighten a dark image on average (dedark default w=~? depends
    # on learned params at init; just check it's a real transform)
    assert not np.allclose(np.asarray(out), np.asarray(img))


def test_tone_filter_uniform_curve_identity_on_01():
    """With all curve params equal, the 8-step tone curve is identity on [0,1]."""
    img = jnp.asarray(rng_img())
    feats = jnp.zeros((2, 8), jnp.float32)  # tanh_range(0.5,2)(0) = 1.25 each step
    out = np.asarray(E.tone_filter(img, feats))
    np.testing.assert_allclose(out, np.asarray(img), rtol=1e-3, atol=1e-4)


def test_usm_matmul_matches_conv():
    """The MXU banded-matmul USM must match the depthwise-conv reference
    implementation (same 25-tap Gaussian, same reflect boundary)."""
    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.uniform(0, 1, (2, 50, 70, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(0, 3, (2, 1)).astype(np.float32))
    mm = np.asarray(E.usm_filter(img, p))
    conv = np.asarray(E.usm_filter_conv(img, p))
    np.testing.assert_allclose(mm, conv, atol=2e-5)
