"""Segment/pose loss unit tests: finiteness, gradability, zero-fg behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dedark_yolo_tpu.losses.segment import (segmentation_loss, pose_loss,
                                            classification_loss, crop_mask)

HYP = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "pose": 12.0, "kobj": 1.0}


def _maps(b=2, nc=3, extra=0, key=0):
    rng = jax.random.PRNGKey(key)
    shapes = [(8, 8), (4, 4), (2, 2)]
    raw, extras = [], []
    for i, (h, w) in enumerate(shapes):
        rng, k1, k2 = jax.random.split(rng, 3)
        raw.append(jax.random.normal(k1, (b, h, w, 64 + nc)) * 0.1)
        if extra:
            extras.append(jax.random.normal(k2, (b, h, w, extra)) * 0.1)
    return raw, extras


def _batch(b=2, m=4):
    rng = np.random.default_rng(0)
    return {
        "cls": jnp.asarray(rng.integers(0, 3, (b, m)).astype(np.float32)),
        "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (b, m, 4)).astype(np.float32)),
        "mask_gt": jnp.asarray(np.concatenate(
            [np.ones((b, m - 1)), np.zeros((b, 1))], 1).astype(np.float32)),
    }


def test_crop_mask():
    masks = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0], [0.0, 0.0, 8.0, 8.0]])
    out = np.asarray(crop_mask(masks, boxes))
    assert out[0].sum() == 16  # 4x4 box
    assert out[1].sum() == 64


@pytest.mark.slow
def test_segmentation_loss_runs_and_grads():
    b, nm = 2, 8
    raw, coefs = _maps(extra=nm)
    protos = jax.random.normal(jax.random.PRNGKey(9), (b, 16, 16, nm)) * 0.1
    batch = _batch()
    # overlap-encoded masks: instance ids 1..3 painted in bands
    masks = np.zeros((b, 16, 16), np.float32)
    masks[:, :5] = 1
    masks[:, 5:10] = 2
    batch["masks"] = jnp.asarray(masks)

    def f(raw, coefs, protos):
        t, items = segmentation_loss(raw, coefs, protos, batch, nc=3,
                                     strides=[8, 16, 32], hyp=HYP, max_fg=16)
        return t

    total = f(raw, coefs, protos)
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: f(raw, coefs, p))(protos)
    assert np.isfinite(np.asarray(grads)).all()
    assert np.abs(np.asarray(grads)).sum() > 0


@pytest.mark.slow
def test_pose_loss_runs_and_grads():
    b, nk = 2, 17
    raw, kpts = _maps(extra=nk * 3)
    batch = _batch()
    rng = np.random.default_rng(1)
    gtk = rng.uniform(0.2, 0.8, (b, 4, nk, 3)).astype(np.float32)
    gtk[..., 2] = (rng.random((b, 4, nk)) > 0.3).astype(np.float32)
    batch["keypoints"] = jnp.asarray(gtk)

    def f(raw, kpts):
        t, items = pose_loss(raw, kpts, batch, nc=3, strides=[8, 16, 32],
                             hyp=HYP, max_fg=16)
        return t

    total = f(raw, kpts)
    assert np.isfinite(float(total))
    g = jax.grad(lambda k: f(raw, k))(kpts)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


@pytest.mark.slow
def test_seg_loss_no_fg_is_finite():
    b, nm = 2, 8
    raw, coefs = _maps(extra=nm, key=3)
    protos = jnp.zeros((b, 16, 16, nm))
    batch = _batch()
    batch["mask_gt"] = jnp.zeros_like(batch["mask_gt"])
    batch["masks"] = jnp.zeros((b, 16, 16))
    t, items = segmentation_loss(raw, coefs, protos, batch, nc=3,
                                 strides=[8, 16, 32], hyp=HYP, max_fg=16)
    assert np.isfinite(float(t))


def test_classification_loss():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    labels = jnp.asarray([0, 1])
    loss, item = classification_loss(logits, labels)
    assert float(loss) < 0.01
    loss2, _ = classification_loss(logits, jnp.asarray([1, 0]))
    assert float(loss2) > float(loss)
