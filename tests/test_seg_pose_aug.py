"""Label-correctness tests for the segment/pose train augmentations
(mosaic + CopyPaste + affine — VERDICT round-1 item 9)."""

import random

import cv2
import numpy as np


def _square_poly(cx, cy, r):
    return np.asarray([[cx - r, cy - r], [cx + r, cy - r],
                       [cx + r, cy + r], [cx - r, cy + r]], np.float32)


def test_seg_mosaic4_shifts_polygons():
    from dedark_yolo_tpu.data.segment import seg_mosaic4
    rng = random.Random(0)
    items = []
    for i in range(4):
        img = np.full((96, 96, 3), 40 + i * 20, np.uint8)
        poly = _square_poly(48, 48, 20)
        cv2.fillPoly(img, [poly.astype(np.int32)], (200, 50, 50))
        items.append((img, np.asarray([float(i % 2)], np.float32), [poly]))
    canvas, cls, polys = seg_mosaic4(items, 96, rng)
    assert canvas.shape == (192, 192, 3)
    assert len(cls) == len(polys) == 4
    for p in polys:
        # polygon vertices land where their tile was pasted: the polygon
        # center pixel on the canvas must be the painted color
        cx, cy = p.mean(0).astype(int)
        if 0 <= cx < 192 and 0 <= cy < 192:
            assert canvas[cy, cx, 0] >= 190  # inside a filled square (BGR 200)


def test_copy_paste_adds_flipped_instances():
    from dedark_yolo_tpu.data.segment import copy_paste, polys_to_boxes
    rng = random.Random(0)
    img = np.full((100, 100, 3), 30, np.uint8)
    poly = _square_poly(25, 50, 10)   # left side; flip target (75, 50) is free
    cv2.fillPoly(img, [poly.astype(np.int32)], (250, 250, 250))
    cls = np.asarray([1.0], np.float32)
    out, new_cls, new_polys = copy_paste(img, cls, [poly], p=1.0, rng=rng)
    assert len(new_cls) == 2 and new_cls[1] == 1.0
    # the pasted instance is the horizontal mirror
    np.testing.assert_allclose(sorted(new_polys[1][:, 0]),
                               sorted(100 - poly[:, 0]))
    assert out[50, 75, 0] > 200   # flipped pixels pasted at the mirror site
    assert out[50, 25, 0] > 200   # original untouched
    boxes = polys_to_boxes(new_polys, 100, 100)
    assert boxes.shape == (2, 4)


def test_copy_paste_respects_overlap_gate():
    """A centered instance overlaps its own mirror (IoA >= 0.3) -> no paste."""
    from dedark_yolo_tpu.data.segment import copy_paste
    rng = random.Random(0)
    img = np.full((100, 100, 3), 30, np.uint8)
    poly = _square_poly(50, 50, 20)   # mirror coincides with itself
    out, cls, polys = copy_paste(img, np.asarray([0.0]), [poly], 1.0, rng)
    assert len(cls) == 1 and len(polys) == 1


def test_seg_affine_keeps_valid_instances():
    from dedark_yolo_tpu.data.segment import seg_affine
    rng = random.Random(3)
    img = np.full((192, 192, 3), 60, np.uint8)
    poly = _square_poly(96, 96, 40)
    hyp = {"degrees": 0.0, "translate": 0.1, "scale": 0.2, "shear": 0.0,
           "perspective": 0.0}
    out, cls, polys = seg_affine(img, np.asarray([2.0]), [poly], hyp,
                                 border=(-48, -48), rng=rng)
    assert out.shape == (96, 96, 3)
    assert len(polys) == 1 and cls[0] == 2.0
    p = polys[0]
    assert (p[:, 0] >= 0).all() and (p[:, 0] <= 96).all()
    assert (p[:, 1] >= 0).all() and (p[:, 1] <= 96).all()


def test_seg_train_transforms_output_contract(tmp_path):
    """End-to-end: SegTrainTransforms output feeds collate_segment."""
    from dedark_yolo_tpu.data.segment import (SegmentDataset,
                                              SegTrainTransforms,
                                              collate_segment)
    root = tmp_path / "ds"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng_np = np.random.default_rng(0)
    for k in range(4):
        img = rng_np.integers(60, 120, (120, 160, 3), dtype=np.uint8)
        poly = _square_poly(80, 60, 30)
        cv2.fillPoly(img, [poly.astype(np.int32)], (220, 60, 60))
        norm = (poly / np.asarray([160, 120.0])).reshape(-1)
        cv2.imwrite(str(root / "images" / "train" / f"t{k}.jpg"), img)
        (root / "labels" / "train" / f"t{k}.txt").write_text(
            "0 " + " ".join(f"{v:.4f}" for v in norm) + "\n")
    ds = SegmentDataset(str(root / "images" / "train"), imgsz=96, nc=1)
    tf = SegTrainTransforms({"mosaic": 1.0, "copy_paste": 0.5, "fliplr": 0.5,
                             "scale": 0.5, "translate": 0.1}, imgsz=96)
    items = [tf(ds, i, random.Random(i)) for i in range(4)]
    batch = collate_segment(items, max_boxes=8, mask_ratio=4)
    assert batch["img"].shape == (4, 96, 96, 3)
    assert batch["masks"].shape == (4, 24, 24)
    # at least one item kept instances through the full pipeline
    assert batch["mask_gt"].sum() > 0
    # normalized box coords
    valid = batch["mask_gt"] > 0
    assert (batch["bboxes"][valid] >= 0).all()
    assert (batch["bboxes"][valid] <= 1).all()


def test_pose_mosaic_and_affine(tmp_path):
    from dedark_yolo_tpu.data.pose import (PoseDataset, PoseTrainTransforms,
                                           collate_pose)
    root = tmp_path / "ds"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng_np = np.random.default_rng(0)
    for k in range(4):
        img = rng_np.integers(60, 120, (128, 128, 3), dtype=np.uint8)
        row = ("0 0.5 0.5 0.4 0.5 "
               "0.5 0.35 2 0.5 0.5 2 0.5 0.65 2")
        cv2.imwrite(str(root / "images" / "train" / f"t{k}.jpg"), img)
        (root / "labels" / "train" / f"t{k}.txt").write_text(row + "\n")
    ds = PoseDataset(str(root / "images" / "train"), imgsz=96, nc=1,
                     kpt_shape=(3, 3))
    tf = PoseTrainTransforms({"mosaic": 1.0, "scale": 0.4, "translate": 0.1},
                             imgsz=96)
    items = [tf(ds, i, random.Random(i + 1)) for i in range(4)]
    batch = collate_pose(items, max_boxes=8, nk=3)
    assert batch["img"].shape == (4, 96, 96, 3)
    assert batch["keypoints"].shape == (4, 8, 3, 3)
    valid = batch["mask_gt"] > 0
    assert valid.sum() > 0
    k = batch["keypoints"][valid]
    vis = k[..., 2] > 0
    # visible keypoints stay inside the normalized frame
    assert (k[..., 0][vis] >= 0).all() and (k[..., 0][vis] <= 1).all()
    assert (k[..., 1][vis] >= 0).all() and (k[..., 1][vis] <= 1).all()
    # keypoints sit inside (or near) their instance box
    b = batch["bboxes"][valid]
    x1 = b[:, 0] - b[:, 2] / 2 - 0.02
    x2 = b[:, 0] + b[:, 2] / 2 + 0.02
    assert ((k[..., 0] >= x1[:, None]) | ~vis).all()
    assert ((k[..., 0] <= x2[:, None]) | ~vis).all()
