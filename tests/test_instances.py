import numpy as np

from dedark_yolo_tpu.data.instances import Bboxes, Instances


def test_bboxes_convert_roundtrip():
    b = Bboxes(np.array([[10, 20, 30, 60]], np.float32), "xyxy")
    b.convert("xywh")
    np.testing.assert_allclose(b.bboxes, [[20, 40, 20, 40]])
    b.convert("ltwh")
    np.testing.assert_allclose(b.bboxes, [[10, 20, 20, 40]])
    b.convert("xyxy")
    np.testing.assert_allclose(b.bboxes, [[10, 20, 30, 60]])


def test_instances_normalize_flip_clip():
    inst = Instances(np.array([[0.5, 0.5, 0.25, 0.5]], np.float32),
                     bbox_format="xywh", normalized=True)
    inst.denormalize(w=200, h=100)
    np.testing.assert_allclose(inst.bboxes, [[100, 50, 50, 50]])
    inst.fliplr(w=200)
    np.testing.assert_allclose(inst.bboxes, [[100, 50, 50, 50]])  # centered cx flips to itself
    inst.convert_bbox("xyxy")
    inst.add_padding(10, 5)
    np.testing.assert_allclose(inst.bboxes, [[85, 30, 135, 80]])
    inst.clip(w=120, h=100)
    np.testing.assert_allclose(inst.bboxes, [[85, 30, 120, 80]])
    keep = inst.remove_zero_area_boxes()
    assert keep.all() and len(inst) == 1


def test_instances_keypoints_follow():
    kpts = np.array([[[10.0, 20.0, 1.0]]], np.float32)
    inst = Instances(np.array([[0, 0, 40, 40]], np.float32), keypoints=kpts,
                     bbox_format="xyxy", normalized=False)
    inst.fliplr(w=100)
    np.testing.assert_allclose(inst.keypoints[0, 0, 0], 90.0)
    inst.scale(0.5, 2.0)
    np.testing.assert_allclose(inst.keypoints[0, 0], [45.0, 40.0, 1.0])
