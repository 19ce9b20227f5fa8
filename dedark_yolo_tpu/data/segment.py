"""Segmentation data plumbing: polygon labels -> fixed-shape mask batches.

Counterpart of the reference's segment label path (data/utils.py:137-191
polygon2mask/polygons2masks_overlap, dataset.py Format with masks). Label rows:
`cls x1 y1 x2 y2 ...` normalized polygon vertices. Masks are rasterized with
cv2.fillPoly and collated overlap-encoded ((B, mh, mw) uint8 with pixel value =
instance index + 1, like the reference's overlap_mask=True default) at
imgsz / mask_ratio resolution.
"""

from __future__ import annotations

import random
from pathlib import Path

import cv2
import numpy as np

from .augment import letterbox
from .dataset import img2label_path, _scan_images


def parse_segment_label(label_path, nc):
    """-> list of (cls, polygon (k,2) normalized). Rows with <6 coords skipped."""
    out = []
    if not Path(label_path).is_file():
        return out
    for line in Path(label_path).read_text().splitlines():
        parts = line.split()
        if len(parts) >= 7:  # cls + >=3 points
            c = int(float(parts[0]))
            assert c < nc, f"class id >= nc in {label_path}"
            pts = np.asarray([float(x) for x in parts[1:]], np.float32)
            if len(pts) % 2 == 0:
                out.append((c, pts.reshape(-1, 2)))
    return out


def polygon2mask(imgsz_hw, polygon_px, value=1, mask=None):
    """Rasterize one pixel-space polygon (reference data/utils.py:137-160)."""
    if mask is None:
        mask = np.zeros(imgsz_hw, np.uint8)
    cv2.fillPoly(mask, [np.asarray(polygon_px, np.int32)], color=value)
    return mask


def polygons2masks_overlap(imgsz_hw, polygons_px):
    """Overlap-encoded instance mask: pixel = instance idx + 1, larger instances
    drawn first so small ones stay visible (reference data/utils.py:168-191)."""
    mask = np.zeros(imgsz_hw, np.uint8)
    areas = [cv2.contourArea(np.asarray(p, np.int32)) for p in polygons_px]
    order = np.argsort(-np.asarray(areas))
    for rank in order:
        polygon2mask(imgsz_hw, polygons_px[rank], value=int(rank) + 1, mask=mask)
    return mask


class SegmentDataset:
    """Images + polygon labels, yielding letterboxed image/boxes/cls/polygons."""

    def __init__(self, img_path, imgsz=640, nc=80):
        self.imgsz = imgsz
        self.nc = nc
        self.im_files = _scan_images(img_path)
        self.labels = [parse_segment_label(img2label_path(f), nc)
                       for f in self.im_files]

    def __len__(self):
        return len(self.im_files)

    def load(self, index, fliplr_p=0.5, train=False, rng=None):
        """-> (img RGB uint8 (s,s,3), boxes xywhn (n,4), cls (n,),
        polygons list of (k,2) pixel coords in letterbox frame)."""
        rng = rng or random
        img = cv2.imread(self.im_files[index])
        h0, w0 = img.shape[:2]
        out, ratio, (dw, dh) = letterbox(img, self.imgsz)
        polys, cls = [], []
        for c, poly_n in self.labels[index]:
            p = poly_n * np.asarray([w0, h0], np.float32)
            p = p * ratio[0] + np.asarray([dw, dh], np.float32)
            polys.append(p)
            cls.append(c)
        if train and rng.random() < fliplr_p:
            out = np.fliplr(out)
            polys = [np.stack([self.imgsz - p[:, 0], p[:, 1]], 1) for p in polys]
        boxes = []
        for p in polys:
            x1, y1 = p[:, 0].min(), p[:, 1].min()
            x2, y2 = p[:, 0].max(), p[:, 1].max()
            s = self.imgsz
            boxes.append([(x1 + x2) / 2 / s, (y1 + y2) / 2 / s,
                          (x2 - x1) / s, (y2 - y1) / s])
        boxes = np.asarray(boxes, np.float32) if boxes else np.zeros((0, 4), np.float32)
        return (np.ascontiguousarray(out[..., ::-1]), boxes,
                np.asarray(cls, np.float32), polys)


def collate_segment(items, max_boxes=32, mask_ratio=4):
    """-> fixed-shape batch with overlap-encoded masks at imgsz/mask_ratio."""
    b = len(items)
    s = items[0][0].shape[0]
    mh = mw = s // mask_ratio
    imgs = np.zeros((b, s, s, 3), np.uint8)
    bboxes = np.zeros((b, max_boxes, 4), np.float32)
    cls = np.zeros((b, max_boxes), np.float32)
    mask_gt = np.zeros((b, max_boxes), np.float32)
    masks = np.zeros((b, mh, mw), np.float32)
    for i, (img, xywh, c, polys) in enumerate(items):
        imgs[i] = img
        n = min(len(c), max_boxes)
        if n:
            bboxes[i, :n] = xywh[:n]
            cls[i, :n] = c[:n]
            mask_gt[i, :n] = 1.0
            scaled = [p / mask_ratio for p in polys[:n]]
            masks[i] = polygons2masks_overlap((mh, mw), scaled)
    return {"img": imgs, "bboxes": bboxes, "cls": cls, "mask_gt": mask_gt,
            "masks": masks}
