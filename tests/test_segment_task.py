"""End-to-end segmentation task test on synthetic polygon data."""

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
        [-1, 1, "Conv", [32, 3, 2]],   # 2 P3/8
        [-1, 1, "C2f", [32, True]],    # 3
        [-1, 1, "Conv", [64, 3, 2]],   # 4 P4/16
        [-1, 1, "Conv", [64, 3, 2]],   # 5 P5/32
    ],
    "head": [[[3, 4, 5], 1, "Segment", ["nc", 8, 32]]],
}


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("segds")
    rng = np.random.default_rng(0)
    colors = [(220, 60, 60), (60, 220, 60)]
    for split, n in (("train", 8), ("val", 4)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for k in range(n):
            img = rng.integers(90, 130, (128, 128, 3), dtype=np.uint8)
            rows = []
            for _ in range(2):
                c = int(rng.integers(0, 2))
                cx, cy = rng.integers(30, 98, 2)
                r = int(rng.integers(12, 24))
                pts = np.stack([cx + r * np.cos(np.linspace(0, 2 * np.pi, 8)),
                                cy + r * np.sin(np.linspace(0, 2 * np.pi, 8))], 1)
                cv2.fillPoly(img, [pts.astype(np.int32)], colors[c])
                norm = (pts / 128.0).clip(0, 1).reshape(-1)
                rows.append(f"{c} " + " ".join(f"{v:.4f}" for v in norm))
            cv2.imwrite(str(img_dir / f"{split}{k}.jpg"), img)
            (lbl_dir / f"{split}{k}.txt").write_text("\n".join(rows) + "\n")
    data = {"path": str(root), "train": "images/train", "val": "images/val",
            "nc": 2, "names": {0: "red", 1: "green"}}
    yp = root / "data.yaml"
    yp.write_text(yaml.safe_dump(data, sort_keys=False))
    return str(yp)


def test_segment_data_pipeline(seg_dataset):
    from dedark_yolo_tpu.data import check_det_dataset
    from dedark_yolo_tpu.data.segment import SegmentDataset, collate_segment
    data = check_det_dataset(seg_dataset)
    ds = SegmentDataset(data["train"], imgsz=96, nc=2)
    assert len(ds) == 8
    img, boxes, cls, polys = ds.load(0)
    assert img.shape == (96, 96, 3)
    assert len(boxes) == len(cls) == len(polys) == 2
    batch = collate_segment([ds.load(i) for i in range(4)], max_boxes=8,
                            mask_ratio=4)
    assert batch["masks"].shape == (4, 24, 24)
    assert batch["masks"].max() >= 1  # instances rasterized
    # overlap encoding: values are instance ids + 1
    assert set(np.unique(batch["masks"])) <= {0.0, 1.0, 2.0}


def test_polygon2mask_overlap_order():
    from dedark_yolo_tpu.data.segment import polygons2masks_overlap
    big = np.array([[2, 2], [20, 2], [20, 20], [2, 20]], np.float32)
    small = np.array([[8, 8], [12, 8], [12, 12], [8, 12]], np.float32)
    m = polygons2masks_overlap((24, 24), [big, small])
    assert m[10, 10] == 2  # small instance (idx 1 -> value 2) wins overlap
    assert m[4, 4] == 1


@pytest.mark.slow
def test_segment_training_and_val(seg_dataset, tmp_path):
    from dedark_yolo_tpu.engine.segment import SegmentationTrainer
    yaml_path = tmp_path / "seg_tiny.yaml"
    yaml_path.write_text(yaml.safe_dump(SEG_TINY))
    trainer = SegmentationTrainer({
        "model": str(yaml_path), "data": seg_dataset, "epochs": 2, "imgsz": 96,
        "batch": 4, "lr0": 0.01, "max_boxes": 8, "max_nms": 256, "max_det": 10,
        "project": str(tmp_path / "runs"), "mask_ratio": 4})
    metrics = trainer.train()
    assert (tmp_path / "runs" / "train" / "weights" / "last.npz").is_file()
    assert "metrics/mAP50(B)" in metrics
    assert "metrics/mAP50(M)" in metrics  # mask mAP computed


@pytest.mark.slow
def test_segment_val_exported_artifact(seg_dataset, tmp_path):
    """YOLO('model.bin').val() routes a segment artifact to
    SegmentationValidator via the task sidecar (the reference vals every
    AutoBackend format through TASK_MAP) and reproduces the live model's
    metrics exactly (same weights, same post)."""
    from dedark_yolo_tpu import YOLO
    yaml_path = tmp_path / "seg_tiny.yaml"
    yaml_path.write_text(yaml.safe_dump(SEG_TINY))
    m = YOLO(str(yaml_path))
    m._ensure_params(96)
    kw = dict(data=seg_dataset, imgsz=96, batch=4, conf=0.001, max_nms=128,
              max_det=8, max_boxes=8, plots=False)
    live = m.val(**kw)
    p = m.export(format="bin", imgsz=96, batch=4, project=str(tmp_path / "b"))
    bm = YOLO(p)
    got = bm.val(**kw)
    assert "metrics/mAP50(M)" in got
    for k in live:
        if k.startswith("metrics/"):
            assert abs(live[k] - got[k]) < 1e-9, k
