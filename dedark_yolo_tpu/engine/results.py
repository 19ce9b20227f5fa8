"""Results/Boxes containers (counterpart of ultralytics/engine/results.py:66,364).

Numpy-backed (post-device): a Results wraps one image's detections in original
image space with .plot()/.save_txt()/.tojson() like the reference API.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class NumpyTensorAPI:
    """Device-move shims from the reference BaseTensor (results.py:41-55).
    Everything here is ALREADY host numpy (results are built after the
    device readback), so cpu()/numpy()/to() are identity — they exist so
    reference-style call chains like `r.boxes.cpu().numpy()` keep working."""

    def cpu(self):
        return self

    def numpy(self):
        return self

    def to(self, *args, **kwargs):
        return self

    def cuda(self):
        raise NotImplementedError(
            "cuda() has no meaning in this TPU-native framework; results "
            "are host numpy arrays")

    @property
    def shape(self):
        return self.data.shape

    def __getitem__(self, idx):
        return type(self)(self.data[idx], self.orig_shape)


class Boxes(NumpyTensorAPI):
    """(n, 6) [x1, y1, x2, y2, conf, cls] in original-image pixels, or
    (n, 7) [x1, y1, x2, y2, track_id, conf, cls] after `model.track()`
    (reference Boxes carries the same optional id column)."""

    def __init__(self, data: np.ndarray, orig_shape):
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = data.reshape(1, -1) if data.size else data.reshape(0, 6)
        # width sniff must survive 0-row arrays: an empty tracked frame is
        # still (0, 7) and keeps is_track/.id semantics
        w = data.shape[1] if data.ndim == 2 and data.shape[1] in (6, 7) else 6
        self.data = data.reshape(-1, w)
        self.is_track = w == 7
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, 4] if self.is_track else None

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                         b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.asarray([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.asarray([w, h, w, h], np.float32)

    @property
    def boxes(self):
        """Deprecated alias of .data (reference results.py:450-455)."""
        from ..utils import LOGGER
        LOGGER.warning("'Boxes.boxes' is deprecated — use 'Boxes.data'")
        return self.data


class Results:
    def __init__(self, orig_img, path, names, boxes=None, speed=None,
                 enhanced_img=None, masks=None, keypoints=None, probs=None):
        from .results_extra import Masks, Keypoints, Probs
        self.orig_img = orig_img            # RGB uint8
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes if boxes is not None else np.zeros((0, 6)),
                           self.orig_shape)
        self.masks = (Masks(masks, self.orig_shape)
                      if masks is not None else None)
        self.keypoints = (Keypoints(keypoints, self.orig_shape)
                          if keypoints is not None else None)
        self.probs = Probs(probs, names) if probs is not None else None
        self.speed = speed or {}
        self.enhanced_img = enhanced_img    # optional lowlight_recovery output

    _keys = ("boxes", "masks", "probs", "keypoints")

    def __len__(self):
        return len(self.boxes)

    @property
    def keys(self):
        """Non-empty component names (reference results.py:161-164)."""
        return [k for k in self._keys if getattr(self, k) is not None]

    def new(self):
        """Empty Results with the same image/path/names (results.py:157-159)."""
        return Results(orig_img=self.orig_img, path=self.path, names=self.names)

    def __getitem__(self, idx):
        """Index detections across every component (results.py:107-112)."""
        r = self.new()
        for k in self.keys:
            if k == "probs":
                r.probs = self.probs
                continue
            comp = getattr(self, k)
            setattr(r, k, comp[idx])
        r.speed = self.speed
        return r

    def update(self, boxes=None, masks=None, probs=None):
        """Replace components in place (reference results.py:114-122)."""
        from .results_extra import Masks
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = probs

    def verbose(self):
        """Per-image log string, '4 persons, 1 bus, ' style (results.py:
        258-273)."""
        s = ""
        if self.probs is not None:
            return ", ".join(f"{self.names.get(int(j), j)} "
                             f"{self.probs.data[j]:.2f}"
                             for j in self.probs.top5) + ", "
        if len(self) == 0:
            return "(no detections), "
        cls = self.boxes.cls.astype(int)
        for c in sorted(set(cls.tolist())):
            n = int((cls == c).sum())
            s += f"{n} {self.names.get(c, c)}{'s' * (n > 1)}, "
        return s

    def pandas(self):
        from ..utils import LOGGER
        LOGGER.warning("'Results.pandas' is not implemented (reference "
                       "results.py:330-332 stub)")

    def plot(self, line_width=None, boxes=True, conf=True, labels=True,
             **kwargs):
        # deprecated kwarg shims (reference results.py:199-215)
        if "show_conf" in kwargs:
            conf = kwargs.pop("show_conf")
        if "show_boxes" in kwargs:
            boxes = kwargs.pop("show_boxes")
        if "line_thickness" in kwargs:
            line_width = kwargs.pop("line_thickness")
        from ..utils.plotting import annotate_image
        img = annotate_image(self.orig_img, self.boxes.data, self.names,
                             line_width, show_boxes=boxes, show_conf=conf,
                             show_labels=labels)
        if self.masks is not None and len(self.masks):
            import cv2
            h, w = self.orig_shape
            overlay = img.copy()
            for j, m in enumerate(self.masks.data):
                mm = m.astype(np.uint8)
                if mm.shape != (h, w):
                    mm = cv2.resize(mm, (w, h), interpolation=cv2.INTER_NEAREST)
                color = np.asarray([(37 * (j + 1)) % 255, (17 * (j + 7)) % 255,
                                    (29 * (j + 3)) % 255], np.uint8)
                overlay[mm > 0] = color
            img = cv2.addWeighted(img, 0.6, overlay, 0.4, 0)
        if self.keypoints is not None and len(self.keypoints):
            import cv2
            img = np.ascontiguousarray(img)
            for inst in self.keypoints.data:
                for x, y, *v in inst:
                    if not v or v[0] > 0.25:
                        cv2.circle(img, (int(x), int(y)), 3, (0, 255, 0), -1)
        return img

    def save(self, filename, **plot_kwargs):
        import cv2
        img = self.plot(**plot_kwargs)
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(filename), img[..., ::-1])
        return filename

    def update_tracks(self, tracks):
        """Replace boxes with tracker output (m, 8) [xyxy, id, conf, cls,
        det_idx]; masks/keypoints are re-indexed to the matched detections
        (the reference's on_predict_postprocess_end does results[i][idx])."""
        tracks = np.asarray(tracks, np.float32).reshape(-1, 8)
        self.boxes = Boxes(tracks[:, :7], self.orig_shape)
        idx = tracks[:, 7].astype(int)
        if self.masks is not None and len(self.masks):
            self.masks.data = self.masks.data[idx]
        if self.keypoints is not None and len(self.keypoints):
            self.keypoints.data = self.keypoints.data[idx]
        return self

    def save_txt(self, txt_file, save_conf=False):
        lines = []
        h, w = self.orig_shape
        for d in self.boxes.data:
            x1, y1, x2, y2 = d[:4]
            conf, c = d[-2], d[-1]
            cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
            bw, bh = (x2 - x1) / w, (y2 - y1) / h
            row = f"{int(c)} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}"
            if save_conf:
                row += f" {conf:.6f}"
            # reference save_txt appends the track id when present
            if self.boxes.is_track:
                row += f" {int(d[4])}"
            lines.append(row)
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return txt_file

    def save_crop(self, save_dir, file_name=None):
        """Save one crop per detection into <save_dir>/<class-name>/ (reference
        results.py save_crop -> plotting.save_one_box: box grown by 2% + 10px
        pad, clipped to the frame, written BGR)."""
        import cv2
        h, w = self.orig_shape
        stem = Path(file_name or self.path or "im").stem
        n_saved = 0
        for i, d in enumerate(self.boxes.data):
            x1, y1, x2, y2 = d[:4]
            c = d[-1]
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            bw, bh = (x2 - x1) * 1.02 + 10, (y2 - y1) * 1.02 + 10
            xa = max(int(cx - bw / 2), 0)
            ya = max(int(cy - bh / 2), 0)
            xb = min(int(cx + bw / 2), w)
            yb = min(int(cy + bh / 2), h)
            if xb <= xa or yb <= ya:
                continue
            name = self.names.get(int(c), str(int(c)))
            out = Path(save_dir) / name
            out.mkdir(parents=True, exist_ok=True)
            crop = self.orig_img[ya:yb, xa:xb]
            # increment on collision (reference save_one_box increment_path):
            # different source images can share a stem (a/img.jpg, b/img.jpg)
            target = out / f"{stem}{'' if i == 0 else i}.jpg"
            bump = 2
            while target.exists():
                target = out / f"{stem}{'' if i == 0 else i}_{bump}.jpg"
                bump += 1
            cv2.imwrite(str(target), crop[..., ::-1])
            n_saved += 1
        return n_saved

    def tojson(self):
        out = []
        for d in self.boxes.data:
            c = int(d[-1])
            row = {"name": self.names.get(c, str(c)), "class": c,
                   "confidence": float(d[-2]),
                   "box": {"x1": float(d[0]), "y1": float(d[1]),
                           "x2": float(d[2]), "y2": float(d[3])}}
            if self.boxes.is_track:
                row["track_id"] = int(d[4])
            out.append(row)
        return json.dumps(out, indent=2)
