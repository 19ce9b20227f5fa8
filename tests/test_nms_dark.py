import numpy as np
import jax.numpy as jnp

from dedark_yolo_tpu.ops import non_max_suppression, dark_channel_priors, lowlight_degrade


def _mk_preds(boxes_xywh, scores_per_class, n_pad=32):
    """Pad candidate arrays to n_pad anchors."""
    n, nc = scores_per_class.shape
    boxes = np.zeros((1, n_pad, 4), np.float32)
    scores = np.zeros((1, n_pad, nc), np.float32)
    boxes[0, :n] = boxes_xywh
    scores[0, :n] = scores_per_class
    return jnp.asarray(boxes), jnp.asarray(scores)


def test_nms_suppresses_overlap():
    boxes = np.array([[50, 50, 20, 20], [52, 50, 20, 20], [200, 200, 20, 20]], np.float32)
    scores = np.array([[0.9], [0.8], [0.7]], np.float32)
    b, s = _mk_preds(boxes, scores)
    dets, counts = non_max_suppression(b, s, conf_thres=0.25, iou_thres=0.45,
                                       max_det=10, max_nms=32, multi_label=False)
    dets, counts = np.asarray(dets), np.asarray(counts)
    assert counts[0] == 2
    # highest score kept first
    np.testing.assert_allclose(dets[0, 0, 4], 0.9, atol=1e-5)
    np.testing.assert_allclose(dets[0, 1, 4], 0.7, atol=1e-5)
    # suppressed rows zeroed, cls = -1
    assert dets[0, 2, 4] == 0 and dets[0, 2, 5] == -1


def test_nms_class_offset_keeps_different_classes():
    """Same box, two classes above threshold -> both survive (multi_label)."""
    boxes = np.array([[50, 50, 20, 20]], np.float32)
    scores = np.array([[0.9, 0.8]], np.float32)
    b, s = _mk_preds(boxes, scores)
    dets, counts = non_max_suppression(b, s, conf_thres=0.25, iou_thres=0.45,
                                       max_det=10, max_nms=32, multi_label=True)
    assert int(counts[0]) == 2
    cls = sorted(np.asarray(dets)[0, :2, 5].tolist())
    assert cls == [0.0, 1.0]


def test_nms_conf_threshold():
    boxes = np.array([[50, 50, 20, 20], [200, 200, 20, 20]], np.float32)
    scores = np.array([[0.9], [0.1]], np.float32)
    b, s = _mk_preds(boxes, scores)
    dets, counts = non_max_suppression(b, s, conf_thres=0.25, iou_thres=0.45,
                                       max_det=10, max_nms=32, multi_label=True)
    assert int(counts[0]) == 1


def test_nms_max_det_cap():
    rng = np.random.default_rng(0)
    n = 20
    boxes = np.stack([rng.uniform(0, 600, n), rng.uniform(0, 600, n),
                      np.full(n, 5.0), np.full(n, 5.0)], -1).astype(np.float32)
    scores = rng.uniform(0.5, 1.0, size=(n, 1)).astype(np.float32)
    b, s = _mk_preds(boxes, scores)
    dets, counts = non_max_suppression(b, s, conf_thres=0.25, iou_thres=0.45,
                                       max_det=5, max_nms=32, multi_label=False)
    assert int(counts[0]) == 5
    sc = np.asarray(dets)[0, :5, 4]
    assert (np.diff(sc) <= 1e-6).all()  # sorted descending


def test_dark_channel_priors():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 1.0, size=(2, 32, 32, 3)).astype(np.float32)
    # make a known bright haze patch
    img[0, :4, :4, :] = 0.95
    A, IcA = dark_channel_priors(jnp.asarray(img))
    A, IcA = np.asarray(A), np.asarray(IcA)
    assert A.shape == (2, 3) and IcA.shape == (2, 32, 32, 1)
    # A for image 0 should be close to the bright patch value
    assert A[0].min() > 0.8
    # IcA = dark channel of img / A: nonnegative
    assert (IcA >= 0).all()
    # dark channel is min over channels
    dc = np.asarray(jnp.min(jnp.asarray(img), axis=-1))
    assert dc.shape == (2, 32, 32)


def test_lowlight_degrade():
    img = np.full((1, 4, 4, 3), 0.5, np.float32)
    out = np.asarray(lowlight_degrade(jnp.asarray(img), 2.0))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)
    out = np.asarray(lowlight_degrade(jnp.asarray(img), 15.0))
    assert (out < 1e-4).all()
