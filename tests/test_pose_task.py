"""End-to-end pose task test on synthetic keypoint data."""

import cv2
import numpy as np
import pytest
import yaml

POSE_TINY = {
    "nc": 1,
    "kpt_shape": [3, 3],
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C2f", [32, True]],    # 3
        [-1, 1, "Conv", [64, 3, 2]],   # 4
        [-1, 1, "Conv", [64, 3, 2]],   # 5
    ],
    "head": [[[3, 4, 5], 1, "Pose", ["nc", [3, 3]]]],
}


@pytest.fixture(scope="module")
def pose_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("poseds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("val", 3)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for k in range(n):
            img = rng.integers(90, 130, (128, 128, 3), dtype=np.uint8)
            cx, cy = (int(v) for v in rng.integers(40, 88, 2))
            pts = [(cx, cy - 15), (cx, cy), (cx, cy + 15)]
            for p in pts:
                cv2.circle(img, p, 4, (250, 50, 50), -1)
            row = (f"0 {cx / 128:.4f} {cy / 128:.4f} {30 / 128:.4f} {40 / 128:.4f} "
                   + " ".join(f"{x / 128:.4f} {y / 128:.4f} 2" for x, y in pts))
            cv2.imwrite(str(root / "images" / split / f"{split}{k}.jpg"), img)
            (root / "labels" / split / f"{split}{k}.txt").write_text(row + "\n")
    (root / "data.yaml").write_text(yaml.safe_dump(
        {"path": str(root), "train": "images/train", "val": "images/val",
         "nc": 1, "names": {0: "obj"}}, sort_keys=False))
    return root


def test_pose_data_pipeline(pose_dataset):
    from dedark_yolo_tpu.data.pose import PoseDataset, collate_pose
    ds = PoseDataset(str(pose_dataset / "images" / "train"), imgsz=96, nc=1,
                     kpt_shape=(3, 3))
    assert len(ds) == 6
    img, boxes, cls, kpts = ds.load(0)
    assert img.shape == (96, 96, 3)
    assert kpts.shape == (1, 3, 3)
    assert (kpts[..., 2] == 2).all()
    batch = collate_pose([ds.load(i) for i in range(4)], max_boxes=8, nk=3)
    assert batch["keypoints"].shape == (4, 8, 3, 3)


@pytest.mark.slow
def test_pose_training_and_val(pose_dataset, tmp_path):
    from dedark_yolo_tpu.engine.pose import PoseTrainer
    yp = tmp_path / "pose_tiny.yaml"
    yp.write_text(yaml.safe_dump(POSE_TINY))
    trainer = PoseTrainer({
        "model": str(yp), "data": str(pose_dataset / "data.yaml"), "epochs": 2,
        "imgsz": 96, "batch": 4, "lr0": 0.01, "max_boxes": 8, "max_nms": 256,
        "max_det": 10, "project": str(tmp_path / "runs")})
    metrics = trainer.train()
    assert "metrics/mAP50(P)" in metrics
    assert (tmp_path / "runs" / "train" / "weights" / "last.npz").is_file()


def test_kpt_oks():
    from dedark_yolo_tpu.engine.pose import kpt_oks
    gt = np.zeros((1, 3, 3), np.float32)
    gt[0, :, 0] = [10, 20, 30]
    gt[0, :, 1] = [10, 20, 30]
    gt[0, :, 2] = 2
    pred = gt.copy()
    area = np.asarray([400.0])
    sig = np.ones(3, np.float32) / 3
    oks = kpt_oks(gt, pred, area, sig)
    np.testing.assert_allclose(oks, 1.0, atol=1e-6)
    pred2 = pred.copy()
    pred2[0, :, 0] += 100  # far off
    assert kpt_oks(gt, pred2, area, sig)[0, 0] < 0.1
