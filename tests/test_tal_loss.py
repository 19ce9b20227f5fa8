import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dedark_yolo_tpu.losses import task_aligned_assign, detection_loss
from dedark_yolo_tpu.losses.tal import select_candidates_in_gts
from dedark_yolo_tpu.ops.anchors import make_anchors


def test_candidates_in_gts():
    anchors = jnp.asarray([[5.0, 5.0], [15.0, 15.0], [25.0, 25.0]])
    gts = jnp.asarray([[[0.0, 0.0, 10.0, 10.0], [10.0, 10.0, 30.0, 30.0]]])
    mask = np.asarray(select_candidates_in_gts(anchors, gts))
    np.testing.assert_array_equal(mask[0], [[1, 0, 0], [0, 1, 1]])


def _toy_assignment(nc=3, n_side=8, stride=8):
    """One GT box covering a region; predictions perfectly confident there."""
    anchors, stride_t = make_anchors([(n_side, n_side)], [stride])
    anc_pix = anchors * stride_t
    n = n_side * n_side
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])  # covers anchors in [1..4]^2 grid
    gt_labels = jnp.asarray([[1]])
    mask_gt = jnp.asarray([[1.0]])
    scores = jnp.full((1, n, nc), 0.05, jnp.float32)
    # boost class 1 inside the box
    inside = ((anc_pix[:, 0] > 8) & (anc_pix[:, 0] < 40) &
              (anc_pix[:, 1] > 8) & (anc_pix[:, 1] < 40))
    scores = scores.at[:, :, 1].set(jnp.where(inside, 0.9, 0.05))
    # predicted boxes = the gt box everywhere
    pboxes = jnp.tile(gt_boxes[0, 0][None, None], (1, n, 1))
    return scores, pboxes, anc_pix, gt_labels, gt_boxes, mask_gt


def test_tal_assigns_inside_anchors():
    scores, pboxes, anc, gl, gb, mg = _toy_assignment()
    res = task_aligned_assign(scores, pboxes, anc, gl, gb, mg, num_classes=3)
    fg = np.asarray(res.fg_mask)
    assert fg.sum() > 0
    # all fg anchors are inside the gt box
    inside = np.asarray(select_candidates_in_gts(anc, gb))[0, 0] > 0
    assert (fg[0] <= inside).all()
    # assigned labels are the gt class
    assert (np.asarray(res.target_labels)[0][fg[0]] == 1).all()
    # max normalized score equals max alignment ratio <= 1
    ts = np.asarray(res.target_scores)
    assert ts.max() <= 1.0 + 1e-5
    assert ts[..., 1].max() > 0.1


def test_tal_empty_gt():
    scores, pboxes, anc, gl, gb, _ = _toy_assignment()
    mg = jnp.zeros((1, 1))
    res = task_aligned_assign(scores, pboxes, anc, gl, gb, mg, num_classes=3)
    assert np.asarray(res.fg_mask).sum() == 0
    assert np.asarray(res.target_scores).sum() == 0


def _toy_raw_maps(b=2, nc=3, key=0):
    rng = jax.random.PRNGKey(key)
    shapes = [(8, 8), (4, 4), (2, 2)]
    maps = []
    for i, (h, w) in enumerate(shapes):
        rng, k = jax.random.split(rng)
        maps.append(jax.random.normal(k, (b, h, w, 64 + nc)) * 0.1)
    return maps


@pytest.mark.slow
def test_detection_loss_runs_and_finite():
    maps = _toy_raw_maps()
    batch = {
        "cls": jnp.asarray([[1, 0], [2, 0]]),
        "bboxes": jnp.asarray([[[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.1, 0.1]],
                               [[0.7, 0.7, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0]]]),
        "mask_gt": jnp.asarray([[1.0, 1.0], [1.0, 0.0]]),
    }
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 2.0}
    total, items = detection_loss(maps, batch, nc=3, strides=[8, 16, 32], hyp=hyp)
    assert np.isfinite(float(total))
    for v in items:
        assert np.isfinite(float(v))


def test_detection_loss_recovery_folds_into_cls():
    maps = _toy_raw_maps()
    batch = {
        "cls": jnp.asarray([[1], [2]]),
        "bboxes": jnp.asarray([[[0.5, 0.5, 0.4, 0.4]], [[0.7, 0.7, 0.2, 0.2]]]),
        "mask_gt": jnp.ones((2, 1)),
    }
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 2.0}
    t0, i0 = detection_loss(maps, batch, nc=3, strides=[8, 16, 32], hyp=hyp)
    batch["recovery_loss"] = jnp.asarray(0.25)
    t1, i1 = detection_loss(maps, batch, nc=3, strides=[8, 16, 32], hyp=hyp)
    # total and cls item grow by lrl * rec; box/dfl unchanged (loss.py:393-415)
    np.testing.assert_allclose(float(t1 - t0), 2.0 * 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(i1.cls - i0.cls), 2.0 * 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(i1.box), float(i0.box), rtol=1e-6)
    np.testing.assert_allclose(float(i1.dfl), float(i0.dfl), rtol=1e-6)


@pytest.mark.slow
def test_detection_loss_gradable():
    maps = _toy_raw_maps()
    batch = {
        "cls": jnp.asarray([[1], [2]]),
        "bboxes": jnp.asarray([[[0.5, 0.5, 0.4, 0.4]], [[0.7, 0.7, 0.2, 0.2]]]),
        "mask_gt": jnp.ones((2, 1)),
    }
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 2.0}

    def f(maps):
        t, _ = detection_loss(maps, batch, nc=3, strides=[8, 16, 32], hyp=hyp)
        return t

    grads = jax.grad(f)(maps)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
