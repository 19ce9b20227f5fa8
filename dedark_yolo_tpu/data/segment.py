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


def resample_segment(poly, n=1000):
    """Densify a polygon to n points along its closed outline (reference
    ops.py:533-551 resample_segments). Pure linear interpolation — the
    geometry is unchanged, but rasterization is NOT: cv2.fillPoly int32-
    truncates every vertex, so a 1000-point outline staircases differently
    from the raw one. The reference resamples in its Instances constructor
    (instance.py:202), so pixel-exact GT-mask parity requires doing the same
    before fillPoly."""
    s = np.concatenate([poly, poly[0:1]], axis=0).astype(np.float32)
    x = np.linspace(0, len(s) - 1, n)
    xp = np.arange(len(s))
    # float32, matching the reference's resample_segments dtype (ops.py:551):
    # fillPoly int32-truncates, so a float64 coordinate that rounds to the
    # next integer under float32 would shift a boundary pixel.
    return np.stack([np.interp(x, xp, s[:, i]) for i in range(2)],
                    axis=1).astype(np.float32)


def polygon2mask(imgsz_hw, polygon_px, value=1, downsample_ratio=1):
    """Rasterize one pixel-space polygon (reference data/utils.py:137-155).

    Parity detail: the reference fillPolys at FULL resolution and then
    cv2.resize()s down by downsample_ratio — the bilinear resize antialiases
    the boundary, which is NOT the same set of pixels as rasterizing the
    /ratio-scaled polygon directly at low resolution. Matching it pixel-exact
    is what lets the reference's own SegmentationValidator reproduce our mask
    mAP on shared weights (scripts/reference_duel_tasks.py)."""
    mask = np.zeros(imgsz_hw, np.uint8)
    cv2.fillPoly(mask, [np.asarray(polygon_px, np.int32)], color=value)
    if downsample_ratio != 1:
        nh, nw = imgsz_hw[0] // downsample_ratio, imgsz_hw[1] // downsample_ratio
        mask = cv2.resize(mask, (nw, nh))
    return mask


def polygons2masks_overlap(imgsz_hw, polygons_px, downsample_ratio=1):
    """Overlap-encoded instance mask at imgsz/ratio: pixel = instance idx + 1,
    larger instances drawn first so small ones stay on top of the overlap
    (reference data/utils.py:173-190; the reference's accumulate-and-clip is
    equivalent to last-drawn-wins). Values keep the ORIGINAL instance index
    (the reference re-sorts labels by area instead — same mask/class pairing
    either way)."""
    nh = imgsz_hw[0] // downsample_ratio
    nw = imgsz_hw[1] // downsample_ratio
    # >255 instances need a wider dtype or values wrap/overflow (the
    # reference guards identically, data/utils.py:175-176)
    out = np.zeros((nh, nw),
                   np.int32 if len(polygons_px) > 255 else np.uint8)
    ms = [polygon2mask(imgsz_hw, resample_segment(p), value=1,
                       downsample_ratio=downsample_ratio)
          for p in polygons_px]
    areas = np.asarray([m.sum() for m in ms])
    for idx in np.argsort(-areas):
        out[ms[idx] > 0] = int(idx) + 1
    return out


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

    def image_shapes(self):
        """(n, 2) original (h, w) per image — header-only reads, cached
        (same contract as YOLODataset.image_shapes; native-space val)."""
        if not hasattr(self, "_shapes"):
            from .dataset import read_image_shapes
            self._shapes = read_image_shapes(self.im_files)
        return self._shapes

    def random_index(self, rng):
        return rng.randrange(len(self.im_files))

    def load_raw(self, index):
        """-> (img BGR max-side-resized to imgsz, cls (n,), polys list of
        (k, 2) pixel coords). No letterbox — mosaic pastes raw tiles."""
        img = cv2.imread(self.im_files[index])
        h0, w0 = img.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            img = cv2.resize(img, (min(int(w0 * r), self.imgsz),
                                   min(int(h0 * r), self.imgsz)),
                             interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        cls, polys = [], []
        for c, poly_n in self.labels[index]:
            cls.append(c)
            polys.append(poly_n * np.asarray([w, h], np.float32))
        return img, np.asarray(cls, np.float32), polys

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
            # rasterize at FULL letterbox res, resize down (reference parity)
            masks[i] = polygons2masks_overlap((s, s), list(polys[:n]),
                                              downsample_ratio=mask_ratio)
    return {"img": imgs, "bboxes": bboxes, "cls": cls, "mask_gt": mask_gt,
            "masks": masks}


def polys_to_boxes(polys, w, h):
    """Polygon list -> clipped pixel xyxy boxes (reference ops segment2box)."""
    boxes = []
    for p in polys:
        x = p[:, 0].clip(0, w)
        y = p[:, 1].clip(0, h)
        boxes.append([x.min(), y.min(), x.max(), y.max()])
    return (np.asarray(boxes, np.float32) if boxes
            else np.zeros((0, 4), np.float32))


def seg_mosaic4(items, imgsz, rng):
    """2x2 polygon mosaic (reference Mosaic._mosaic4 with segments): paste 4
    max-side-resized samples on a 2s canvas around a random center, shifting
    each sample's polygons by its paste offset."""
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    out_cls, out_polys = [], []
    for i, (img, cls, polys) in enumerate(items):
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y1b + (y2a - y1a),
                                       x1b:x1b + (x2a - x1a)]
        padw, padh = x1a - x1b, y1a - y1b
        for c, p in zip(cls, polys):
            out_cls.append(c)
            out_polys.append(p + np.asarray([padw, padh], np.float32))
    return canvas, np.asarray(out_cls, np.float32), out_polys


def _bbox_ioa(box1, box2, eps=1e-7):
    """Intersection over box2 area, (N, M) (reference metrics.py bbox_ioa)."""
    ix = (np.minimum(box1[:, None, 2], box2[None, :, 2]) -
          np.maximum(box1[:, None, 0], box2[None, :, 0])).clip(0)
    iy = (np.minimum(box1[:, None, 3], box2[None, :, 3]) -
          np.maximum(box1[:, None, 1], box2[None, :, 1])).clip(0)
    area2 = ((box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1]))[None]
    return ix * iy / (area2 + eps)


def copy_paste(img, cls, polys, p, rng):
    """Copy-Paste augmentation (reference augment.py:608-645): instances whose
    LEFT-RIGHT-FLIPPED copy overlaps every existing box with IoA < 0.30 are
    candidates; round(p*n) of them are pasted as flipped pixels + flipped
    polygon labels."""
    if not p or not len(polys):
        return img, cls, polys
    h, w = img.shape[:2]
    boxes = polys_to_boxes(polys, w, h)
    flip_polys = [np.stack([w - q[:, 0], q[:, 1]], 1) for q in polys]
    flip_boxes = polys_to_boxes(flip_polys, w, h)
    ioa = _bbox_ioa(flip_boxes, boxes)
    eligible = np.nonzero((ioa < 0.30).all(1))[0]
    k = round(p * len(eligible))
    if k == 0:
        return img, cls, polys
    pick = rng.sample(list(eligible), k=k)
    mask = np.zeros(img.shape[:2], np.uint8)
    cls = list(cls)
    polys = list(polys)
    for j in pick:
        cls.append(cls[j])
        polys.append(flip_polys[j])
        cv2.fillPoly(mask, [flip_polys[j].astype(np.int32)], 1)
    flipped = img[:, ::-1]
    img = img.copy()
    img[mask.astype(bool)] = flipped[mask.astype(bool)]
    return img, np.asarray(cls, np.float32), polys


def seg_affine(img, cls, polys, hyp, border, rng):
    """Affine warp of image + polygons; boxes re-derived from warped polygons
    (reference RandomPerspective with segments: apply_segments + segment2box)."""
    from .augment import _affine_matrix, warp_image, transform_points
    persp = hyp.get("perspective", 0.0)
    M, height, width, _ = _affine_matrix(
        img.shape, hyp.get("degrees", 0.0), hyp.get("translate", 0.1),
        hyp.get("scale", 0.5), hyp.get("shear", 0.0), persp, border, rng)
    img = warp_image(img, M, height, width, persp)
    new_polys, new_cls = [], []
    for c, q in zip(cls, polys):
        tq = transform_points(q, M, persp).astype(np.float32)
        tq[:, 0] = tq[:, 0].clip(0, width)
        tq[:, 1] = tq[:, 1].clip(0, height)
        bw = tq[:, 0].max() - tq[:, 0].min()
        bh = tq[:, 1].max() - tq[:, 1].min()
        if bw > 2 and bh > 2:   # degenerate-instance filter
            new_polys.append(tq)
            new_cls.append(c)
    return img, np.asarray(new_cls, np.float32), new_polys


class SegTrainTransforms:
    """Segment train pipeline: mosaic4 -> CopyPaste -> affine -> HSV -> fliplr,
    emitting the (img RGB, boxes xywhn, cls, polys) tuple collate_segment
    consumes. Mirrors the reference v8_transforms order (augment.py:767-795);
    `mosaic_enabled` supports close_mosaic."""

    def __init__(self, hyp, imgsz=640):
        self.hyp = hyp
        self.imgsz = imgsz
        self.mosaic_enabled = True

    def __call__(self, ds, index, rng):
        h = self.hyp
        s = self.imgsz
        use_mosaic = self.mosaic_enabled and rng.random() < h.get("mosaic", 1.0)
        if use_mosaic:
            idxs = [index] + [ds.random_index(rng) for _ in range(3)]
            img, cls, polys = seg_mosaic4([ds.load_raw(i) for i in idxs], s, rng)
            img, cls, polys = copy_paste(img, cls, polys,
                                         h.get("copy_paste", 0.0), rng)
            border = (-s // 2, -s // 2)
        else:
            img, cls, polys = ds.load_raw(index)
            ih, iw = img.shape[:2]
            out, ratio, (dw, dh) = letterbox(img, s)
            img = out
            polys = [q * np.asarray(ratio, np.float32)
                     + np.asarray([dw, dh], np.float32) for q in polys]
            border = (0, 0)
        img, cls, polys = seg_affine(img, cls, polys, h, border, rng)
        from .augment import photometric_augment, random_hsv
        if h.get("photometric", True):
            img = photometric_augment(img, rng)
        img = random_hsv(img, h.get("hsv_h", 0.015), h.get("hsv_s", 0.7),
                         h.get("hsv_v", 0.4), rng)
        ih, iw = img.shape[:2]
        if rng.random() < h.get("fliplr", 0.5):
            img = np.fliplr(img)
            polys = [np.stack([iw - q[:, 0], q[:, 1]], 1) for q in polys]
        boxes = polys_to_boxes(polys, iw, ih)
        if len(boxes):
            xywh = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2 / iw,
                             (boxes[:, 1] + boxes[:, 3]) / 2 / ih,
                             (boxes[:, 2] - boxes[:, 0]) / iw,
                             (boxes[:, 3] - boxes[:, 1]) / ih], 1)
        else:
            xywh = np.zeros((0, 4), np.float32)
        return (np.ascontiguousarray(img[..., ::-1]),
                xywh.astype(np.float32), cls, polys)
