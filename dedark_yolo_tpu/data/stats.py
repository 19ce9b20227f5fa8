"""Dataset statistics + preview packaging (reference data/utils.py:318-525,
HUBDatasetStats / compress_one_image / zip_directory).

The reference's class exists to upload datasets to the Ultralytics HUB
service; the statistics artifact itself (stats.json + compressed previews in a
`<dataset>-hub/` directory) is useful offline, so this produces the exact same
JSON schema with no service client: per-split instance/image per-class counts
and the rounded label rows keyed by image filename. YOLO txt rows already
carry each task's coordinates (bbox / polygon / bbox+keypoints), so one parser
covers detect, segment, and pose.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..utils import LOGGER
from .dataset import check_det_dataset, img2label_path, _scan_images


def compress_one_image(f, f_new=None, max_dim: int = 1920, quality: int = 50):
    """Resize to <= max_dim and re-encode as quality-50 JPEG
    (reference data/utils.py:445-476)."""
    from PIL import Image

    try:
        im = Image.open(f)
        r = max_dim / max(im.height, im.width)
        if r < 1.0:
            im = im.resize((int(im.width * r), int(im.height * r)))
        im.convert("RGB").save(f_new or f, "JPEG", quality=quality,
                               optimize=True)
    except Exception as e:  # PIL-unreadable -> cv2 fallback (reference :466)
        import cv2
        im = cv2.imread(str(f))
        if im is None:
            raise FileNotFoundError(f"cannot read image {f}") from e
        r = max_dim / max(im.shape[:2])
        if r < 1.0:
            im = cv2.resize(im, (int(im.shape[1] * r), int(im.shape[0] * r)),
                            interpolation=cv2.INTER_AREA)
        cv2.imwrite(str(f_new or f), im)


def zip_directory(dir, compress: bool = True) -> Path:
    """Zip a directory's contents into <dir>.zip (reference :501-524)."""
    from zipfile import ZIP_DEFLATED, ZIP_STORED, ZipFile

    dir = Path(dir)
    if not dir.is_dir():
        raise FileNotFoundError(f"directory not found: {dir}")
    out = dir.with_suffix(".zip")
    with ZipFile(out, "w", ZIP_DEFLATED if compress else ZIP_STORED) as z:
        for f in sorted(dir.rglob("*")):
            if f.is_file():
                z.write(f, f.relative_to(dir))
    return out


class DatasetStats:
    """Build the HUB-schema stats.json for a detect/segment/pose dataset.

    Accepts a data.yaml path/dict or a .zip containing one (reference
    HUBDatasetStats._unzip). Artifacts land in `<dataset-path>-hub/`.
    """

    def __init__(self, path, task: str = "detect"):
        path = path if isinstance(path, dict) else Path(path)
        if not isinstance(path, dict) and str(path).endswith(".zip"):
            from ..utils.downloads import unzip_file
            unzip_dir = unzip_file(path, path=Path(path).parent)
            yamls = list(Path(unzip_dir).glob("*.yaml")) or \
                list(Path(unzip_dir).rglob("*.yaml"))
            if not yamls:
                raise FileNotFoundError(f"no data.yaml inside {path}")
            path = yamls[0]
        self.data = check_det_dataset(path)
        self.task = task
        self.hub_dir = Path(str(self.data.get("path", ".")) + "-hub")
        self.im_dir = self.hub_dir / "images"
        self.stats = {"nc": self.data["nc"],
                      "names": list(self.data["names"].values())}

    @staticmethod
    def _read_rows(label_file):
        """[[cls, coords...], ...] from one YOLO txt label file."""
        p = Path(label_file)
        if not p.is_file():
            return []
        rows = []
        for line in p.read_text().splitlines():
            parts = line.split()
            if parts:
                rows.append([int(float(parts[0])),
                             *(round(float(x), 4) for x in parts[1:])])
        return rows

    def get_json(self, save: bool = False, verbose: bool = False):
        for split in ("train", "val", "test"):
            if not self.data.get(split):
                self.stats[split] = None
                continue
            im_files = _scan_images(self.data[split])
            nc = self.data["nc"]
            per_image = []
            labels = []
            for f in im_files:
                rows = self._read_rows(img2label_path(f))
                per_image.append(np.bincount(
                    np.asarray([r[0] for r in rows], dtype=int),
                    minlength=nc))
                labels.append({Path(f).name: rows})
            x = (np.stack(per_image) if per_image
                 else np.zeros((0, nc), dtype=int))
            self.stats[split] = {
                "instance_stats": {"total": int(x.sum()),
                                   "per_class": x.sum(0).tolist()},
                "image_stats": {"total": len(im_files),
                                "unlabelled": int(np.all(x == 0, 1).sum()),
                                "per_class": (x > 0).sum(0).tolist()},
                "labels": labels,
            }
        if save:
            self.hub_dir.mkdir(parents=True, exist_ok=True)
            sp = self.hub_dir / "stats.json"
            sp.write_text(json.dumps(self.stats))
            LOGGER.info(f"saved {sp}")
        if verbose:
            LOGGER.info(json.dumps(self.stats, indent=2))
        return self.stats

    def process_images(self) -> Path:
        """Compressed preview copies of every image (reference :431-443)."""
        self.im_dir.mkdir(parents=True, exist_ok=True)
        for split in ("train", "val", "test"):
            if not self.data.get(split):
                continue
            for f in _scan_images(self.data[split]):
                compress_one_image(f, self.im_dir / Path(f).name)
        LOGGER.info(f"compressed previews in {self.im_dir}")
        return self.im_dir
