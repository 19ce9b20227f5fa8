"""Host-side training augmentations (numpy/cv2), feeding fixed-shape device batches.

Pipeline parity with the reference v8_transforms (ultralytics/data/augment.py:767-795):
Mosaic(p) -> RandomPerspective -> MixUp(p) -> RandomHSV -> RandomFlip(ud) ->
RandomFlip(lr), then Format to normalized xywh. Val uses LetterBox only
(dataset.py:134-150). CopyPaste and Albumentations are segment-/extra-dep-paths
the detect task never exercises with default hyp (p=0) — copy_paste is a no-op
without segments, albumentations is an optional import in the reference.

These run on the host (like the reference's cv2 pipeline) because they are
data-dependent ragged ops; everything after collate is fixed-shape device work.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass

import cv2
import numpy as np


def letterbox(img, new_shape=(640, 640), color=114, scaleup=True, center=True,
              stride=32, auto=False, scale_fill=False):
    """Ratio-preserving resize + pad. Reference augment.py:540-605.

    Returns (img, ratio, (dw, dh)).
    """
    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    if center:
        dw /= 2
        dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT,
                             value=(color, color, color))
    return img, (r, r), (dw, dh)


def random_hsv(img, hgain=0.015, sgain=0.7, vgain=0.4, rng=None):
    """HSV jitter. Reference augment.py (RandomHSV)."""
    rng = rng or random
    if hgain or sgain or vgain:
        r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        dtype = img.dtype
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                            cv2.LUT(val, lut_val)))
        img = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
    return img


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate transformed boxes (reference augment.py RandomPerspective)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr) &
            (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


def _affine_matrix(img_shape, degrees, translate, scale, shear, perspective,
                   border, rng):
    """Random M = T @ S @ R @ P @ C + output (height, width, s) for an affine
    warp (reference augment.py RandomPerspective affine_transform)."""
    height = img_shape[0] + border[0] * 2
    width = img_shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img_shape[1] / 2
    C[1, 2] = -img_shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    return T @ S @ R @ P @ C, height, width, s


def warp_image(img, M, height, width, perspective=0.0):
    """Apply the affine/perspective matrix with the gray-114 border fill."""
    if perspective:
        return cv2.warpPerspective(img, M, dsize=(width, height),
                                   borderValue=(114, 114, 114))
    return cv2.warpAffine(img, M[:2], dsize=(width, height),
                          borderValue=(114, 114, 114))


def transform_points(pts, M, perspective=0.0):
    """Transform (n, 2) pixel points by the 3x3 matrix."""
    n = len(pts)
    if n == 0:
        return pts
    xy = np.ones((n, 3))
    xy[:, :2] = pts
    xy = xy @ M.T
    return xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]


def random_perspective(img, boxes_xyxy, cls, degrees=0.0, translate=0.1,
                       scale=0.5, shear=0.0, perspective=0.0, border=(0, 0),
                       rng=None):
    """Affine/perspective warp of image + xyxy pixel boxes.

    Reference augment.py (RandomPerspective): M = T @ S @ R @ P @ C, warp with
    gray 114 border, transform box corners, clip, filter candidates.
    """
    rng = rng or random
    M, height, width, s = _affine_matrix(img.shape, degrees, translate, scale,
                                         shear, perspective, border, rng)
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        img = warp_image(img, M, height, width, perspective)

    n = len(boxes_xyxy)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = boxes_xyxy[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack((x.min(1), y.min(1), x.max(1), y.max(1)), axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = _box_candidates(boxes_xyxy.T * s, new.T)
        boxes_xyxy = new[keep]
        cls = cls[keep]
    return img, boxes_xyxy, cls


@dataclass
class Sample:
    """One decoded image + labels in pixel xyxy."""
    img: np.ndarray           # HWC BGR uint8
    boxes: np.ndarray         # (n, 4) xyxy pixels
    cls: np.ndarray           # (n,)


def mosaic4(samples, imgsz, rng=None):
    """2x2 mosaic on a 2s x 2s gray canvas. Reference augment.py:118-269 (Mosaic).

    samples: list of 4 Samples already max-side-resized to ~imgsz.
    Returns a Sample with border offset applied (canvas coords).
    """
    rng = rng or random
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    out_boxes, out_cls = [], []
    for i, sm in enumerate(samples):
        h, w = sm.img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = sm.img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(sm.boxes):
            b = sm.boxes.copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            out_boxes.append(b)
            out_cls.append(sm.cls)
    boxes = np.concatenate(out_boxes, 0) if out_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(out_cls, 0) if out_cls else np.zeros((0,), np.float32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    return Sample(canvas, boxes, cls)


def mosaic9(samples, imgsz, rng=None):
    """3x3 mosaic on a 3s x 3s gray canvas (reference Mosaic n=9 variant,
    augment.py:118-269). samples: 9 Samples max-side-resized to ~imgsz."""
    rng = rng or random
    s = imgsz
    canvas = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
    out_boxes, out_cls = [], []
    # center tile first, then ring positions (reference order is center + ring)
    offsets = [(1, 1), (0, 0), (1, 0), (2, 0), (0, 1), (2, 1), (0, 2), (1, 2),
               (2, 2)]
    for sm, (cx, cy) in zip(samples, offsets):
        h, w = sm.img.shape[:2]
        # jitter placement within the cell so the crop varies like the reference
        ox = cx * s + rng.randint(0, max(s - w, 0)) if s > w else cx * s
        oy = cy * s + rng.randint(0, max(s - h, 0)) if s > h else cy * s
        canvas[oy:oy + h, ox:ox + w] = sm.img
        if len(sm.boxes):
            b = sm.boxes.copy()
            b[:, [0, 2]] += ox
            b[:, [1, 3]] += oy
            out_boxes.append(b)
            out_cls.append(sm.cls)
    # crop the central 2s x 2s window (reference crops to the final border)
    x0 = y0 = s // 2
    canvas = canvas[y0:y0 + 2 * s, x0:x0 + 2 * s]
    boxes = np.concatenate(out_boxes, 0) if out_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(out_cls, 0) if out_cls else np.zeros((0,), np.float32)
    if len(boxes):
        boxes[:, [0, 2]] -= x0
        boxes[:, [1, 3]] -= y0
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
        keep = ((boxes[:, 2] - boxes[:, 0]) > 2) & ((boxes[:, 3] - boxes[:, 1]) > 2)
        boxes, cls = boxes[keep], cls[keep]
    return Sample(canvas, boxes, cls)


def mixup(sample_a, sample_b, rng=None):
    """MixUp with beta(32, 32) (reference augment.py MixUp).

    The beta draw comes from the SEEDED per-item rng, keeping the loader's
    determinism contract (two loaders with the same seed produce identical
    batches even with mixup > 0)."""
    rng = rng or random
    r = rng.betavariate(32.0, 32.0)
    img = (sample_a.img.astype(np.float32) * r +
           sample_b.img.astype(np.float32) * (1 - r)).astype(np.uint8)
    boxes = np.concatenate([sample_a.boxes, sample_b.boxes], 0)
    cls = np.concatenate([sample_a.cls, sample_b.cls], 0)
    return Sample(img, boxes, cls)


def photometric_augment(img, rng, p=0.01):
    """Albumentations-equivalent photometric extras (reference augment.py:
    648-672: A.Blur/A.MedianBlur/A.ToGray/A.CLAHE each at p=0.01, active in
    v8_transforms:792 whenever the package is installed). Re-implemented in
    cv2/numpy with the same defaults so trained-model robustness matches the
    reference-with-albumentations: Blur ksize 3..7, MedianBlur odd ksize 3..7,
    ToGray channel-replicated, CLAHE clip 1..4 on the LAB L channel with an
    8x8 tile grid. Box-preserving (all four are pixel-only), drawn from the
    SEEDED per-item rng so the loader's determinism contract holds."""
    if rng.random() < p:  # A.Blur(blur_limit=7)
        k = rng.randint(3, 7)
        img = cv2.blur(img, (k, k))
    if rng.random() < p:  # A.MedianBlur(blur_limit=7), ksize must be odd
        k = rng.choice((3, 5, 7))
        img = cv2.medianBlur(np.ascontiguousarray(img), k)
    if rng.random() < p:  # A.ToGray()
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        img = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
    if rng.random() < p:  # A.CLAHE(clip_limit=4.0, tile_grid_size=(8, 8))
        clip = rng.uniform(1.0, 4.0)
        lab = cv2.cvtColor(np.ascontiguousarray(img), cv2.COLOR_BGR2LAB)
        clahe = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8))
        lab[..., 0] = clahe.apply(lab[..., 0])
        img = cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)
    return img


class TrainTransforms:
    """Mosaic + affine + mixup + HSV + flips, emitting (img_uint8_RGB, boxes_xywhn, cls).

    `mosaic_enabled` can be switched off for the final close_mosaic epochs
    (reference dataset.py:152-157), falling back to LetterBox like the reference's
    pre_transform path. CopyPaste is intentionally absent HERE: it requires
    instance polygons, so in the reference's detect pipeline it is a no-op
    (augment.py:621 gates on len(instances.segments)); the segment pipeline
    (data/segment.py SegTrainTransforms) implements it for real.
    """

    def __init__(self, hyp, imgsz=640, n_mosaic=4):
        self.hyp = hyp
        self.imgsz = imgsz
        self.n_mosaic = n_mosaic  # 4 (2x2) or 9 (3x3), like the reference Mosaic
        self.mosaic_enabled = True

    def __call__(self, get_sample, index, rng: random.Random):
        h = self.hyp
        use_mosaic = self.mosaic_enabled and rng.random() < h.get("mosaic", 1.0)
        if use_mosaic:
            n_extra = self.n_mosaic - 1
            idxs = [index] + [get_sample.random_index(rng) for _ in range(n_extra)]
            mosaic_fn = mosaic9 if self.n_mosaic == 9 else mosaic4
            sample = mosaic_fn([get_sample(i, self.imgsz) for i in idxs],
                               self.imgsz, rng)
            border = (-self.imgsz // 2, -self.imgsz // 2)
        else:
            sm = get_sample(index, self.imgsz)
            img, ratio, (dw, dh) = letterbox(sm.img, self.imgsz)
            boxes = sm.boxes.copy()
            if len(boxes):
                boxes[:, [0, 2]] = boxes[:, [0, 2]] * ratio[0] + dw
                boxes[:, [1, 3]] = boxes[:, [1, 3]] * ratio[1] + dh
            sample = Sample(img, boxes, sm.cls)
            border = (0, 0)

        img, boxes, cls = random_perspective(
            sample.img, sample.boxes, sample.cls, degrees=h.get("degrees", 0.0),
            translate=h.get("translate", 0.1), scale=h.get("scale", 0.5),
            shear=h.get("shear", 0.0), perspective=h.get("perspective", 0.0),
            border=border, rng=rng)
        sample = Sample(img, boxes, cls)

        if use_mosaic and rng.random() < h.get("mixup", 0.0):
            idx2 = get_sample.random_index(rng)
            other_idxs = [idx2] + [get_sample.random_index(rng) for _ in range(3)]
            other = mosaic4([get_sample(i, self.imgsz) for i in other_idxs],
                            self.imgsz, rng)
            oimg, oboxes, ocls = random_perspective(
                other.img, other.boxes, other.cls, degrees=h.get("degrees", 0.0),
                translate=h.get("translate", 0.1), scale=h.get("scale", 0.5),
                shear=h.get("shear", 0.0), perspective=h.get("perspective", 0.0),
                border=border, rng=rng)
            sample = mixup(sample, Sample(oimg, oboxes, ocls), rng)

        # photometric extras sit exactly where the reference wires
        # Albumentations: after MixUp, before RandomHSV (augment.py:792)
        img = sample.img
        if h.get("photometric", True):
            img = photometric_augment(img, rng)
        img = random_hsv(img, h.get("hsv_h", 0.015), h.get("hsv_s", 0.7),
                         h.get("hsv_v", 0.4), rng)
        boxes, cls = sample.boxes, sample.cls

        ih, iw = img.shape[:2]
        if rng.random() < h.get("flipud", 0.0):
            img = np.flipud(img)
            if len(boxes):
                boxes[:, [1, 3]] = ih - boxes[:, [3, 1]]
        if rng.random() < h.get("fliplr", 0.5):
            img = np.fliplr(img)
            if len(boxes):
                boxes[:, [0, 2]] = iw - boxes[:, [2, 0]]

        img = np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB
        # normalized xywh (Format, reference augment.py:697-764)
        if len(boxes):
            xywh = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2 / iw,
                             (boxes[:, 1] + boxes[:, 3]) / 2 / ih,
                             (boxes[:, 2] - boxes[:, 0]) / iw,
                             (boxes[:, 3] - boxes[:, 1]) / ih], 1).astype(np.float32)
            # drop zero-area remnants (Format remove_zero_area_boxes)
            keep = (xywh[:, 2] > 0) & (xywh[:, 3] > 0)
            xywh, cls = xywh[keep], cls[keep]
        else:
            xywh = np.zeros((0, 4), np.float32)
        return img, xywh, cls.astype(np.float32)


class ValTransforms:
    """LetterBox only (reference dataset.py:146-150). `imgsz` may be an int or a
    rectangular (h, w) target for rect-val buckets."""

    def __init__(self, imgsz=640):
        self.imgsz = imgsz

    def __call__(self, get_sample, index, rng=None):
        max_side = self.imgsz if isinstance(self.imgsz, int) else max(self.imgsz)
        sm = get_sample(index, max_side)
        img, ratio, (dw, dh) = letterbox(sm.img, self.imgsz, scaleup=True)
        boxes = sm.boxes.copy()
        if len(boxes):
            boxes[:, [0, 2]] = boxes[:, [0, 2]] * ratio[0] + dw
            boxes[:, [1, 3]] = boxes[:, [1, 3]] * ratio[1] + dh
        ih, iw = img.shape[:2]
        img = np.ascontiguousarray(img[..., ::-1])
        if len(boxes):
            xywh = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2 / iw,
                             (boxes[:, 1] + boxes[:, 3]) / 2 / ih,
                             (boxes[:, 2] - boxes[:, 0]) / iw,
                             (boxes[:, 3] - boxes[:, 1]) / ih], 1).astype(np.float32)
        else:
            xywh = np.zeros((0, 4), np.float32)
        return img, xywh, sm.cls.astype(np.float32)
