"""Dataset: image/label scan, verification, label cache, sample access.

Counterpart of the reference's BaseDataset/YOLODataset (ultralytics/data/base.py:21,
dataset.py:14): scans an images dir or a txt list, maps images->labels via the
'/images/ -> /labels/' convention (data/utils.py:39 img2label_paths), verifies and
caches labels with a content hash (dataset.py:30-131), max-side-resizes images on
load (base.py:142-169), supports RAM caching, and exposes the get_sample protocol
the augment pipeline consumes.
"""

from __future__ import annotations

import hashlib
import random
from pathlib import Path

import cv2
import numpy as np
import yaml

IMG_FORMATS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}
CACHE_VERSION = "dedark-tpu-1.0"


def read_image_shapes(im_files):
    """(n, 2) int32 array of original (h, w) per file via header-only reads."""
    from PIL import Image
    import cv2
    shapes = []
    for f in im_files:
        try:
            with Image.open(f) as im:
                w, h = im.size
        except Exception:
            h, w = cv2.imread(str(f)).shape[:2]
        shapes.append((h, w))
    return np.asarray(shapes, np.int32)


def img2label_path(img_path: str) -> str:
    """images/... -> labels/... with .txt (reference data/utils.py:39)."""
    sa, sb = f"{Path('/').root}", None  # placate linters
    p = str(img_path)
    parts = p.rsplit(f"{'/'}images{'/'}", 1)
    if len(parts) == 2:
        return parts[0] + "/labels/" + str(Path(parts[1]).with_suffix(".txt"))
    return str(Path(p).with_suffix(".txt"))


def check_det_dataset(data):
    """Resolve a dataset yaml into dict(path, train, val, names, nc).

    Reference: ultralytics/data/utils.py:193-267 (without auto-download).
    """
    if isinstance(data, dict):
        d = dict(data)
    else:
        p = Path(data)
        if not p.is_file():
            # packaged dataset cards resolve by name, e.g. data='tielu.yaml'
            # (reference keeps them in ultralytics/cfg/datasets/)
            cand = Path(__file__).parents[1] / "cfg" / "datasets" / p.name
            if cand.is_file():
                p = cand
        with open(p, errors="ignore") as f:
            d = yaml.safe_load(f)
        d.setdefault("path", str(p.parent))
    root = Path(d.get("path", "."))
    for k in ("train", "val", "test"):
        if d.get(k):
            p = Path(d[k])
            d[k] = str(p if p.is_absolute() else root / p)
    names = d.get("names")
    if isinstance(names, (list, tuple)):
        names = {i: n for i, n in enumerate(names)}
    elif names is None:
        names = {i: str(i) for i in range(d.get("nc", 80))}
    d["names"] = names
    d["nc"] = len(names)
    return d


def _scan_images(path) -> list:
    p = Path(path)
    if p.is_dir():
        files = sorted(str(f) for f in p.rglob("*") if f.suffix.lower() in IMG_FORMATS)
    elif p.is_file() and p.suffix == ".txt":
        base = p.parent
        files = []
        for line in p.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            fp = Path(line)
            files.append(str(fp if fp.is_absolute() else base / fp))
    else:
        raise FileNotFoundError(f"dataset path not found: {path}")
    if not files:
        raise FileNotFoundError(f"no images found in {path}")
    return files


def verify_label(label_path, nc) -> np.ndarray:
    """Load and validate one label file -> (n, 5) [cls, cx, cy, w, h] normalized.

    Reference checks (data/utils.py:63-135): 5 columns, normalized coords <= 1,
    nonnegative, class < nc, duplicate rows removed.
    """
    if not Path(label_path).is_file():
        return np.zeros((0, 5), np.float32)
    rows = []
    for line in Path(label_path).read_text().splitlines():
        parts = line.split()
        if len(parts) >= 5:
            rows.append([float(x) for x in parts[:5]])
    if not rows:
        return np.zeros((0, 5), np.float32)
    lb = np.asarray(rows, np.float32)
    assert lb.shape[1] == 5, f"labels require 5 columns: {label_path}"
    assert (lb >= 0).all(), f"negative label values: {label_path}"
    assert (lb[:, 1:] <= 1).all(), f"non-normalized coordinates: {label_path}"
    assert (lb[:, 0] < nc).all(), f"class id >= nc in {label_path}"
    lb = np.unique(lb, axis=0)
    return lb


class YOLODataset:
    """Detection dataset with label cache and max-side image loading."""

    def __init__(self, img_path, imgsz=640, nc=80, cache=False, fraction=1.0,
                 single_cls=False, rank=0):
        self.imgsz = imgsz
        self.nc = nc
        self.single_cls = single_cls
        self.im_files = _scan_images(img_path)
        if fraction < 1.0:
            self.im_files = self.im_files[:max(1, int(len(self.im_files) * fraction))]
        self.label_files = [img2label_path(f) for f in self.im_files]
        self.labels = self._load_cache()
        self._ram = {} if cache in (True, "ram") else None
        self._disk = cache == "disk"  # .npy sidecars (reference base.py:171-209)

    # -- label cache -------------------------------------------------------
    def _hash(self):
        h = hashlib.sha256()
        for f, lf in zip(self.im_files, self.label_files):
            h.update(f.encode())
            p = Path(lf)
            if p.is_file():
                h.update(str(p.stat().st_mtime_ns).encode())
        h.update(CACHE_VERSION.encode())
        return h.hexdigest()

    def _cache_path(self):
        return Path(self.im_files[0]).parent.parent / "labels.cache.npz"

    def _load_cache(self):
        cp = self._cache_path()
        want = self._hash()
        if cp.is_file():
            try:
                z = np.load(cp, allow_pickle=True)
                if str(z["hash"]) == want:
                    return list(z["labels"])
            except Exception:
                pass
        labels = [verify_label(lf, self.nc) for lf in self.label_files]
        try:
            np.savez(cp, hash=want, labels=np.asarray(labels, dtype=object))
        except OSError:
            pass
        return labels

    # -- sample access (the get_sample protocol for augment) ---------------
    def __len__(self):
        return len(self.im_files)

    def image_shapes(self):
        """(n, 2) array of original (h, w) per image, header-only reads (PIL),
        cached. Used by rect-val aspect bucketing (reference base.py:211-234)
        and native-space validation."""
        if not hasattr(self, "_shapes"):
            self._shapes = read_image_shapes(self.im_files)
        return self._shapes

    def random_index(self, rng: random.Random):
        return rng.randrange(len(self.im_files))

    def orig_shape(self, index):
        img = self._read(index)
        return img.shape[:2]

    def _read(self, index):
        if self._ram is not None and index in self._ram:
            return self._ram[index]
        if self._disk:
            npy = Path(self.im_files[index]).with_suffix(".npy")
            if npy.is_file():
                return np.load(npy)
        img = cv2.imread(self.im_files[index])
        if img is None:
            raise FileNotFoundError(f"image not found: {self.im_files[index]}")
        if self._disk:
            try:
                np.save(Path(self.im_files[index]).with_suffix(".npy"), img)
            except OSError:
                pass
        if self._ram is not None:
            self._ram[index] = img
        return img

    def __call__(self, index, imgsz=None):
        """Return a Sample resized so max side == imgsz (reference base.py:142-169)."""
        from .augment import Sample
        imgsz = imgsz or self.imgsz
        img = self._read(index)
        h0, w0 = img.shape[:2]
        r = imgsz / max(h0, w0)
        if r != 1:
            img = cv2.resize(img, (min(int(w0 * r), imgsz), min(int(h0 * r), imgsz)),
                             interpolation=cv2.INTER_LINEAR)
        lb = self.labels[index]
        cls = lb[:, 0].copy()
        if self.single_cls:
            cls[:] = 0
        # normalized xywh -> pixel xyxy at loaded size
        h, w = img.shape[:2]
        if len(lb):
            cx, cy, bw, bh = lb[:, 1] * w, lb[:, 2] * h, lb[:, 3] * w, lb[:, 4] * h
            boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
        else:
            boxes = np.zeros((0, 4), np.float32)
        return Sample(img, boxes.astype(np.float32), cls.astype(np.float32))
