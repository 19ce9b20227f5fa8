"""COCO json -> YOLO converter (dedark_yolo_tpu/data/coco.py; reference
data/converter.py:13-209). Pure numpy/cv2 — fast tier."""

import json

import numpy as np
import pytest

from dedark_yolo_tpu.data.coco import (coco91_to_coco80_class, convert_coco,
                                       merge_multi_segment, rle_decode,
                                       rle2polygon)


def test_coco91_to_coco80_map():
    m = coco91_to_coco80_class()
    assert len(m) == 91
    assert m[0] == 0            # person: id 1 -> 0
    assert m[11] is None        # id 12 (street sign) unused
    assert m[12] == 11          # id 13 (stop sign) -> 11
    assert m[89] == 79          # id 90 (toothbrush) -> 79, the last class
    assert m[90] is None        # id 91 (hair brush) unused
    assert sum(v is not None for v in m) == 80


def _rle_encode_uncompressed(mask):
    """Column-major run lengths starting with a 0-run (COCO convention)."""
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    counts, prev, run = [], 0, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev, run = v, 1
    counts.append(run)
    return {"size": list(mask.shape), "counts": counts}


def _rle_compress(counts):
    """pycocotools-style LEB128 6-bit encoding with deltas after index 2."""
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or
                        (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def test_rle_decode_uncompressed_and_compressed():
    rng = np.random.default_rng(0)
    mask = np.zeros((13, 9), np.uint8)
    mask[2:8, 1:5] = 1
    mask[10:12, 6:9] = 1
    rle = _rle_encode_uncompressed(mask)
    np.testing.assert_array_equal(rle_decode(rle), mask)
    comp = {"size": rle["size"], "counts": _rle_compress(rle["counts"])}
    np.testing.assert_array_equal(rle_decode(comp), mask)
    # polygon extraction finds both blobs
    polys = rle2polygon(rle)
    # approxPolyDP can collapse the tiny blob to a 2-point contour
    assert len(polys) == 2 and all(len(p) >= 4 for p in polys)


def test_merge_multi_segment_connects_parts():
    a = [0, 0, 10, 0, 10, 10, 0, 10]
    b = [20, 0, 30, 0, 30, 10, 20, 10]
    merged = np.concatenate(merge_multi_segment([a, b]), 0)
    assert merged.shape[1] == 2
    pts = {tuple(p) for p in merged.tolist()}
    # every original vertex survives in the merged polygon
    for poly in (a, b):
        for x, y in np.array(poly).reshape(-1, 2):
            assert (x, y) in pts


def test_convert_coco_end_to_end(tmp_path):
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    mask = np.zeros((100, 200), np.uint8)
    mask[10:30, 20:60] = 1
    rle = _rle_encode_uncompressed(mask)
    data = {
        "images": [{"id": 7, "height": 100, "width": 200,
                    "file_name": "im7.jpg"},
                   {"id": 8, "height": 100, "width": 200,
                    "file_name": "im8.jpg"}],
        "annotations": [
            # plain box, category 13 (stop sign) -> class 11 after 91->80
            {"image_id": 7, "category_id": 13, "iscrowd": 0,
             "bbox": [20, 10, 40, 20]},
            # polygon pair merged into one row, category 1 -> class 0
            {"image_id": 7, "category_id": 1, "iscrowd": 0,
             "bbox": [0, 0, 20, 20],
             "segmentation": [[0, 0, 20, 0, 20, 20],
                              [40, 0, 60, 0, 60, 20]]},
            # RLE instance
            {"image_id": 8, "category_id": 1, "iscrowd": 0,
             "bbox": [20, 10, 40, 20], "segmentation": rle},
            # crowd: skipped
            {"image_id": 8, "category_id": 1, "iscrowd": 1,
             "bbox": [0, 0, 50, 50]},
            # degenerate box: skipped
            {"image_id": 8, "category_id": 1, "iscrowd": 0,
             "bbox": [5, 5, 0, 10]},
        ],
    }
    (ann_dir / "instances_val.json").write_text(json.dumps(data))
    out = convert_coco(ann_dir, save_dir=tmp_path / "out")
    t7 = (out / "labels" / "val" / "im7.txt").read_text().splitlines()
    assert len(t7) == 2
    c, cx, cy, w, h = map(float, t7[0].split())
    assert (c, cx, cy, w, h) == (11, 0.2, 0.2, 0.2, 0.2)
    t8 = (out / "labels" / "val" / "im8.txt").read_text().splitlines()
    assert len(t8) == 1 and t8[0].startswith("0 ")

    # segments mode: polygon rows replace boxes where present
    out2 = convert_coco(ann_dir, save_dir=tmp_path / "out2",
                        use_segments=True)
    rows = (out2 / "labels" / "val" / "im7.txt").read_text().splitlines()
    seg_row = next(r for r in rows if r.startswith("0 "))
    vals = list(map(float, seg_row.split()))[1:]
    assert len(vals) >= 12 and len(vals) % 2 == 0
    assert all(0 <= v <= 1 for v in vals)


def test_robust_imread_imwrite_unicode_path(tmp_path):
    """utils/patches.py (reference patches.py): cv2 IO survives non-ASCII
    paths via imencode/imdecode + fromfile/tofile."""
    import cv2
    from dedark_yolo_tpu.utils.patches import imread, imwrite
    img = np.zeros((8, 8, 3), np.uint8)
    img[2:6, 2:6] = (0, 255, 0)
    p = tmp_path / "изображение_测试.png"
    assert imwrite(p, img)
    back = imread(p)
    assert back is not None and np.array_equal(back, img)
    assert imread(tmp_path / "missing.png") is None
