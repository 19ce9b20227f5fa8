"""Fused flat-buffer optimizer: numerical parity with the treewise path.

The fused variant exists purely for TPU throughput (one big elementwise
kernel over a flat fp32 buffer instead of ~500 leaf-sized tile-padded
kernels); it must be a bit-for-bit twin of engine/optim.opt_update modulo
the grad-norm reduction order. Reference optimizer semantics under test are
the same as test_optim_semantics.py (trainer.py:340-345, 611-665).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dedark_yolo_tpu.engine.optim import (flat_to_tree, flatten_for_opt,
                                          fused_init_opt_state,
                                          fused_opt_update,
                                          fused_state_from_tree,
                                          fused_state_to_tree, init_opt_state,
                                          label_params, opt_update,
                                          tree_to_flat)


def _params(seed=0):
    """A small but label-diverse tree: conv weight, norm scale, two biases."""
    rng = np.random.default_rng(seed)
    return {
        "conv": {"kernel": jnp.asarray(rng.normal(0, .1, (3, 3, 8, 16))
                                       .astype(np.float32)),
                 "bias": jnp.asarray(rng.normal(0, .1, (16,))
                                     .astype(np.float32))},
        "bn": {"scale": jnp.asarray(rng.normal(1, .1, (16,))
                                    .astype(np.float32)),
               "bias": jnp.asarray(rng.normal(0, .1, (16,))
                                   .astype(np.float32))},
        "head": {"kernel": jnp.asarray(rng.normal(0, .1, (16, 4))
                                       .astype(np.float32))},
    }


def _grads(seed):
    rng = np.random.default_rng(100 + seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(0, 1e-2, p.shape)
                              .astype(np.float32)), _params())


def _run_pair(kind, accumulate, steps=5, clip_norm=10.0):
    params = _params()
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    kw = dict(kind=kind, weight_decay=0.0005, clip_norm=clip_norm)

    p_t, st_t = params, init_opt_state(params)
    p_f, st_f = params, fused_init_opt_state(params, spec)
    for i in range(steps):
        g = _grads(i)
        lr = jnp.float32(0.01 + 0.001 * i)
        lrb = jnp.float32(0.1 - 0.01 * i)
        mom = jnp.float32(0.8 + 0.02 * i)
        p_t, st_t, a_t = opt_update(p_t, g, st_t, labels, lr_bias=lrb, lr=lr,
                                    momentum=mom, accumulate=accumulate, **kw)
        p_f, st_f, a_f = fused_opt_update(p_f, g, st_f, spec, lr_bias=lrb,
                                          lr=lr, momentum=mom,
                                          accumulate=accumulate, **kw)
        assert bool(a_t) == bool(a_f)
    return p_t, st_t, p_f, st_f, spec


@pytest.mark.parametrize("kind", ["sgd", "adamw"])
@pytest.mark.parametrize("accumulate", [1, 3])
def test_fused_matches_treewise(kind, accumulate):
    p_t, st_t, p_f, st_f, spec = _run_pair(kind, accumulate)
    flat_t = jax.tree_util.tree_leaves(p_t)
    flat_f = jax.tree_util.tree_leaves(p_f)
    for a, b in zip(flat_t, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    assert int(st_t.step) == int(st_f.step)
    assert int(st_t.micro) == int(st_f.micro)
    # momentum buffers agree too (resume-equivalence)
    for a, b in zip(jax.tree_util.tree_leaves(st_t.buf),
                    jax.tree_util.tree_leaves(flat_to_tree(st_f.buf, spec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_fused_clip_active():
    """With a tiny clip_norm both paths must clip identically."""
    p_t, _, p_f, _, _ = _run_pair("sgd", 1, steps=2, clip_norm=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(p_t),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_masks_match_labels():
    params = _params()
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    bias = np.asarray(spec.bias_mask)
    wd = np.asarray(spec.wd_mask)
    # reconstruct per-leaf masks and check against the labels
    labs = jax.tree_util.tree_leaves(labels)
    for lab, o, s in zip(labs, spec.offsets, spec.sizes):
        assert (bias[o:o + s] == (1.0 if lab == "bias" else 0.0)).all()
        assert (wd[o:o + s] == (1.0 if lab == "weight" else 0.0)).all()
    assert not np.any((bias > 0) & (wd > 0))


def test_roundtrip_state_conversion():
    """fused<->tree state conversion is exact (checkpoint format stability)."""
    params = _params()
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    _, st_t, _, st_f, _ = _run_pair("adamw", 2, steps=4)
    tree_from_fused = fused_state_to_tree(st_f, spec)
    for a, b in zip(jax.tree_util.tree_leaves(st_t.buf2),
                    jax.tree_util.tree_leaves(tree_from_fused.buf2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    back = fused_state_from_tree(tree_from_fused, spec)
    np.testing.assert_allclose(np.asarray(back.acc), np.asarray(st_f.acc))
    np.testing.assert_allclose(np.asarray(back.buf), np.asarray(st_f.buf))


def test_fused_ema_matches_treewise():
    """Flat EMA (params+batch_stats) == treewise utils/ema.ema_update,
    including the applied-gate semantics under grad accumulation."""
    from dedark_yolo_tpu.engine.optim import flat_spec, fused_ema_update
    from dedark_yolo_tpu.utils import ema_init, ema_update

    params = _params()
    bs = {"bn": {"mean": jnp.linspace(0, 1, 16, dtype=jnp.float32),
                 "var": jnp.linspace(1, 2, 16, dtype=jnp.float32)}}
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    bspec = flat_spec(bs)

    ema_t = ema_init({"params": params, "batch_stats": bs})
    eu_t = jnp.zeros((), jnp.int32)
    ema_p = tree_to_flat(params, spec)
    ema_b = tree_to_flat(bs, bspec)
    eu_f = jnp.zeros((), jnp.int32)

    for i in range(6):
        cur_p = jax.tree_util.tree_map(lambda p: p + 0.01 * (i + 1), params)
        cur_b = jax.tree_util.tree_map(lambda b: b + 0.1 * (i + 1), bs)
        applied = jnp.bool_(i % 2 == 0)  # every other step applies
        ema_t, eu_t = jax.lax.cond(
            applied,
            lambda t: ema_update(t[0], {"params": cur_p, "batch_stats": cur_b},
                                 t[1]),
            lambda t: t, (ema_t, eu_t))
        ema_p, ema_b, eu_f = fused_ema_update(
            ema_p, ema_b, tree_to_flat(cur_p, spec),
            tree_to_flat(cur_b, bspec), eu_f, applied)

    assert int(eu_t) == int(eu_f) == 3
    for a, b in zip(jax.tree_util.tree_leaves(ema_t["params"]),
                    jax.tree_util.tree_leaves(flat_to_tree(ema_p, spec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ema_t["batch_stats"]),
                    jax.tree_util.tree_leaves(flat_to_tree(ema_b, bspec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_flat_roundtrip():
    params = _params()
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    flat = tree_to_flat(params, spec)
    assert flat.shape == (spec.n,)
    back = flat_to_tree(flat, spec)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("kind", ["sgd", "adamw"])
@pytest.mark.parametrize("accumulate", [1, 3])
def test_flatmaster_matches_treewise(kind, accumulate):
    """fused_opt_update_flat (the flat-master train-step path, no tree
    boundaries at all) is a bit-for-bit twin of the treewise optimizer."""
    from dedark_yolo_tpu.engine.optim import fused_opt_update_flat

    params = _params()
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    kw = dict(kind=kind, weight_decay=0.0005, clip_norm=10.0)

    p_t, st_t = params, init_opt_state(params)
    pf, st_f = tree_to_flat(params, spec), fused_init_opt_state(params, spec)
    for i in range(5):
        g = _grads(i)
        lr = jnp.float32(0.01 + 0.001 * i)
        lrb = jnp.float32(0.1 - 0.01 * i)
        mom = jnp.float32(0.8 + 0.02 * i)
        p_t, st_t, a_t = opt_update(p_t, g, st_t, labels, lr_bias=lrb, lr=lr,
                                    momentum=mom, accumulate=accumulate, **kw)
        pf, st_f, a_f = fused_opt_update_flat(
            pf, tree_to_flat(g, spec), st_f, lr_bias=lrb, lr=lr,
            momentum=mom, accumulate=accumulate, **kw)
        assert bool(a_t) == bool(a_f)
    for a, b in zip(jax.tree_util.tree_leaves(p_t),
                    jax.tree_util.tree_leaves(flat_to_tree(pf, spec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    assert int(st_t.step) == int(st_f.step)
    assert int(st_t.micro) == int(st_f.micro)
    for a, b in zip(jax.tree_util.tree_leaves(st_t.buf),
                    jax.tree_util.tree_leaves(flat_to_tree(st_f.buf, spec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    # accumulator parity matters for resume mid-accumulation-window
    for a, b in zip(jax.tree_util.tree_leaves(st_t.acc),
                    jax.tree_util.tree_leaves(flat_to_tree(st_f.acc, spec))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_unflatten_diff_gradient_exact():
    """Gradients through the custom-VJP unflatten equal the treewise
    gradients flattened — including through a bf16 cast like the amp loss."""
    from dedark_yolo_tpu.engine.optim import make_unflatten_diff

    params = _params()
    labels = label_params(params)
    spec = flatten_for_opt(params, labels)
    unflat = make_unflatten_diff(spec)
    w = _grads(7)  # arbitrary per-leaf weights

    def loss_tree(p):
        p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
        return sum(jnp.sum((x.astype(jnp.float32) ** 2) * wi)
                   for x, wi in zip(jax.tree_util.tree_leaves(p16),
                                    jax.tree_util.tree_leaves(w)))

    g_tree = jax.grad(loss_tree)(params)
    g_flat = jax.grad(lambda f: loss_tree(unflat(f)))(
        tree_to_flat(params, spec))
    np.testing.assert_allclose(np.asarray(g_flat),
                               np.asarray(tree_to_flat(g_tree, spec)),
                               rtol=1e-6, atol=1e-8)
    # forward is the identity view
    back = unflat(tree_to_flat(params, spec))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
