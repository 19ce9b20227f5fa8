"""Pose data plumbing: keypoint labels -> fixed-shape batches.

Label rows (Ultralytics pose format): `cls cx cy w h kx1 ky1 v1 kx2 ky2 v2 ...`
normalized. Collated to (B, max_boxes, nk, 3)."""

from __future__ import annotations

import random
from pathlib import Path

import cv2
import numpy as np

from .augment import letterbox
from .dataset import img2label_path, _scan_images


def parse_pose_label(label_path, nc, nk):
    out = []
    if not Path(label_path).is_file():
        return out
    for line in Path(label_path).read_text().splitlines():
        p = line.split()
        if len(p) >= 5 + nk * 3:
            c = int(float(p[0]))
            assert c < nc, f"class id >= nc in {label_path}"
            box = np.asarray([float(x) for x in p[1:5]], np.float32)
            kpt = np.asarray([float(x) for x in p[5:5 + nk * 3]],
                             np.float32).reshape(nk, 3)
            out.append((c, box, kpt))
    return out


class PoseDataset:
    def __init__(self, img_path, imgsz=640, nc=1, kpt_shape=(17, 3)):
        self.imgsz = imgsz
        self.nc = nc
        self.nk = kpt_shape[0]
        self.im_files = _scan_images(img_path)
        self.labels = [parse_pose_label(img2label_path(f), nc, self.nk)
                       for f in self.im_files]

    def __len__(self):
        return len(self.im_files)

    def load(self, index, fliplr_p=0.0, train=False, rng=None):
        """-> (img RGB uint8 (s,s,3), boxes xywhn, cls, kpts (n,nk,3) normalized
        to the LETTERBOX frame)."""
        rng = rng or random
        img = cv2.imread(self.im_files[index])
        h0, w0 = img.shape[:2]
        out, ratio, (dw, dh) = letterbox(img, self.imgsz)
        s = self.imgsz
        boxes, cls, kpts = [], [], []
        for c, box_n, kpt_n in self.labels[index]:
            cx = (box_n[0] * w0 * ratio[0] + dw) / s
            cy = (box_n[1] * h0 * ratio[1] + dh) / s
            bw = box_n[2] * w0 * ratio[0] / s
            bh = box_n[3] * h0 * ratio[1] / s
            k = kpt_n.copy()
            k[:, 0] = (k[:, 0] * w0 * ratio[0] + dw) / s
            k[:, 1] = (k[:, 1] * h0 * ratio[1] + dh) / s
            boxes.append([cx, cy, bw, bh])
            cls.append(c)
            kpts.append(k)
        if train and rng.random() < fliplr_p:
            out = np.fliplr(out)
            for b in boxes:
                b[0] = 1.0 - b[0]
            for k in kpts:
                k[:, 0] = 1.0 - k[:, 0]
        boxes = np.asarray(boxes, np.float32) if boxes else np.zeros((0, 4), np.float32)
        kpts = (np.stack(kpts) if kpts
                else np.zeros((0, self.nk, 3), np.float32))
        return (np.ascontiguousarray(out[..., ::-1]), boxes,
                np.asarray(cls, np.float32), kpts)


def collate_pose(items, max_boxes=32, nk=17):
    b = len(items)
    s = items[0][0].shape[0]
    imgs = np.zeros((b, s, s, 3), np.uint8)
    bboxes = np.zeros((b, max_boxes, 4), np.float32)
    cls = np.zeros((b, max_boxes), np.float32)
    mask_gt = np.zeros((b, max_boxes), np.float32)
    keypoints = np.zeros((b, max_boxes, nk, 3), np.float32)
    for i, (img, xywh, c, k) in enumerate(items):
        imgs[i] = img
        n = min(len(c), max_boxes)
        if n:
            bboxes[i, :n] = xywh[:n]
            cls[i, :n] = c[:n]
            mask_gt[i, :n] = 1.0
            keypoints[i, :n] = k[:n]
    return {"img": imgs, "bboxes": bboxes, "cls": cls, "mask_gt": mask_gt,
            "keypoints": keypoints}
