import numpy as np
import jax.numpy as jnp

from dedark_yolo_tpu.ops import (bbox_iou, box_iou_matrix, xywh2xyxy, xyxy2xywh,
                                 clip_boxes, scale_boxes)


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 640, size=(32, 4)).astype(np.float32)
    out = xyxy2xywh(xywh2xyxy(jnp.asarray(boxes)))
    np.testing.assert_allclose(np.asarray(out), boxes, rtol=1e-5, atol=1e-4)


def test_iou_identical():
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    iou = bbox_iou(b, b, xywh=False)
    np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-5)


def test_iou_half_overlap():
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.asarray([[5.0, 0.0, 15.0, 10.0]])
    # inter = 50, union = 150
    iou = bbox_iou(b1, b2, xywh=False)
    np.testing.assert_allclose(np.asarray(iou), 50.0 / 150.0, atol=1e-3)


def test_ciou_less_than_iou_for_offset_boxes():
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.asarray([[5.0, 5.0, 15.0, 15.0]])
    iou = float(bbox_iou(b1, b2, xywh=False)[0, 0])
    ciou = float(bbox_iou(b1, b2, xywh=False, CIoU=True)[0, 0])
    assert ciou < iou  # penalty terms are positive here


def test_iou_matrix_shape_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 3.0, 3.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [10.0, 10.0, 11.0, 11.0], [0.5, 0.5, 1.5, 1.5]])
    m = np.asarray(box_iou_matrix(a, b))
    assert m.shape == (2, 3)
    assert m[0, 0] > 0.99
    assert m[0, 1] == 0.0
    assert m[1, 2] == 0.0


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 700.0, 700.0]])
    out = np.asarray(clip_boxes(b, (640, 640)))
    np.testing.assert_allclose(out, [[0, 0, 640, 640]])


def test_scale_boxes_letterbox_inverse():
    # 640x640 letterboxed from a 480x640 original: gain=1.0, pad=(0, 80)
    boxes = jnp.asarray([[100.0, 180.0, 200.0, 280.0]])
    out = np.asarray(scale_boxes((640, 640), boxes, (480, 640)))
    np.testing.assert_allclose(out, [[100.0, 100.0, 200.0, 200.0]], atol=1.0)


def test_increment_dir(tmp_path):
    """increment_dir (reference increment_path): predict -> predict2 -> ...
    when the dir exists; exist_ok reuses; non-existent passes through."""
    from dedark_yolo_tpu.utils import increment_dir
    p = tmp_path / "predict"
    assert increment_dir(p) == p
    p.mkdir()
    assert increment_dir(p).name == "predict2"
    assert increment_dir(p, exist_ok=True) == p
    (tmp_path / "predict2").mkdir()
    assert increment_dir(p).name == "predict3"
