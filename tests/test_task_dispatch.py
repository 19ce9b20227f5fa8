"""Facade task dispatch: YOLO.val/.predict route to the task triple.

Reference TASK_MAP (engine/model.py:17-26) maps every task to its own
(Trainer, Validator, Predictor); round 1 hard-coded the detect pair. These
tests drive segment/pose/classify end-to-end through the YOLO facade.
"""

from pathlib import Path

import cv2
import numpy as np
import pytest
import yaml

SEG_TINY = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C2f", [32, True]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
    ],
    "head": [[[3, 4, 5], 1, "Segment", ["nc", 8, 32]]],
}

POSE_TINY = {
    "nc": 1,
    "kpt_shape": [3, 3],
    "backbone": SEG_TINY["backbone"],
    "head": [[[3, 4, 5], 1, "Pose", ["nc", [3, 3]]]],
}

CLS_TINY = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[-1, 1, "Classify", ["nc"]]],
}


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(3)
    for k in range(3):
        img = rng.integers(60, 200, (100, 140, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"im{k}.jpg"), img)
    return d


def _write_yaml(tmp_path, name, d):
    p = tmp_path / name
    p.write_text(yaml.safe_dump(d))
    return str(p)


@pytest.mark.slow
def test_yolo_predict_segment(img_dir, tmp_path):
    from dedark_yolo_tpu import YOLO
    m = YOLO(_write_yaml(tmp_path, "seg.yaml", SEG_TINY))
    assert m.model.task == "segment"
    res = m.predict(str(img_dir), imgsz=96, conf=0.0001, batch=2,
                    max_nms=128, max_det=8)
    assert len(res) == 3
    r = res[0]
    assert r.masks is not None
    # masks are at original image resolution after pad-crop + upsample
    if len(r.masks):
        assert r.masks.data.shape[1:] == r.orig_shape
        assert len(r.masks) == len(r.boxes)
    r.plot()  # mask overlay path


@pytest.mark.slow
def test_yolo_predict_pose(img_dir, tmp_path):
    from dedark_yolo_tpu import YOLO
    m = YOLO(_write_yaml(tmp_path, "pose.yaml", POSE_TINY))
    assert m.model.task == "pose"
    res = m.predict(str(img_dir), imgsz=96, conf=0.0001, batch=2,
                    max_nms=128, max_det=8)
    r = res[0]
    assert r.keypoints is not None
    if len(r.keypoints):
        assert r.keypoints.data.shape[1:] == (3, 3)
        h, w = r.orig_shape
        assert (r.keypoints.xy[..., 0] <= w).all()
        assert (r.keypoints.xy[..., 1] <= h).all()
    r.plot()


@pytest.mark.slow
def test_yolo_predict_classify(img_dir, tmp_path):
    from dedark_yolo_tpu import YOLO
    m = YOLO(_write_yaml(tmp_path, "cls.yaml", CLS_TINY))
    assert m.model.task == "classify"
    res = m.predict(str(img_dir), imgsz=64, batch=2)
    assert len(res) == 3
    p = res[0].probs
    assert p is not None and 0 <= p.top1 < 3
    np.testing.assert_allclose(p.data.sum(), 1.0, atol=1e-4)


@pytest.mark.slow
def test_yolo_val_segment(img_dir, tmp_path):
    """YOLO('...seg.yaml').val() routes to SegmentationValidator."""
    from dedark_yolo_tpu import YOLO
    root = tmp_path / "segval"
    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for k in range(2):
        img = rng.integers(90, 130, (96, 96, 3), dtype=np.uint8)
        pts = np.asarray([[30, 30], [60, 30], [60, 60], [30, 60]], np.float32)
        cv2.fillPoly(img, [pts.astype(np.int32)], (220, 60, 60))
        norm = (pts / 96).reshape(-1)
        cv2.imwrite(str(root / "images" / "val" / f"v{k}.jpg"), img)
        (root / "labels" / "val" / f"v{k}.txt").write_text(
            "0 " + " ".join(f"{v:.4f}" for v in norm) + "\n")
    data = {"path": str(root), "train": "images/val", "val": "images/val",
            "nc": 2, "names": {0: "a", 1: "b"}}
    dp = root / "data.yaml"
    dp.write_text(yaml.safe_dump(data, sort_keys=False))

    m = YOLO(_write_yaml(tmp_path, "seg2.yaml", SEG_TINY))
    metrics = m.val(data=str(dp), imgsz=96, batch=2, max_boxes=8,
                    max_nms=128, max_det=8)
    assert "metrics/mAP50(M)" in metrics
    assert "fitness" in metrics


@pytest.mark.slow
def test_yolo_track_segment(img_dir, tmp_path):
    """track() through the segment predictor: update_tracks re-indexes masks
    to the matched detections, so masks stay aligned with the 7-col boxes."""
    from dedark_yolo_tpu import YOLO
    m = YOLO(_write_yaml(tmp_path, "seg.yaml", SEG_TINY))
    tcfg = tmp_path / "t.yaml"
    tcfg.write_text(
        "tracker_type: bytetrack\ntrack_high_thresh: 0.00005\n"
        "track_low_thresh: 0.00001\nnew_track_thresh: 0.00005\n"
        "track_buffer: 30\nmatch_thresh: 0.95\n")
    res = m.track(str(img_dir), imgsz=96, conf=0.00001, batch=2,
                  persist=True, tracker=str(tcfg), max_nms=128, max_det=8)
    assert len(res) == 3
    for r in res:
        if len(r.boxes):
            assert r.boxes.is_track
            assert r.masks is not None and len(r.masks) == len(r.boxes)
