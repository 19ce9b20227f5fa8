"""Synthetic dataset generator shared by data/engine tests: colored rectangles on
noise backgrounds with exact labels, written in YOLO layout."""

from pathlib import Path

import cv2
import numpy as np
import yaml

CLASS_COLORS = [(255, 64, 64), (64, 255, 64), (64, 64, 255)]  # BGR per class


def make_synth_dataset(root, n_train=8, n_val=4, imgsz=160, nc=3, seed=0):
    root = Path(root)
    rng = np.random.default_rng(seed)
    names = {i: f"class{i}" for i in range(nc)}
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for k in range(n):
            h = int(rng.integers(imgsz - 40, imgsz + 40))
            w = int(rng.integers(imgsz - 40, imgsz + 40))
            img = rng.integers(90, 140, size=(h, w, 3), dtype=np.uint8)
            n_obj = int(rng.integers(1, 4))
            rows = []
            for _ in range(n_obj):
                c = int(rng.integers(0, nc))
                bw = int(rng.integers(20, max(21, w // 3)))
                bh = int(rng.integers(20, max(21, h // 3)))
                x1 = int(rng.integers(0, w - bw))
                y1 = int(rng.integers(0, h - bh))
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), CLASS_COLORS[c], -1)
                rows.append((c, (x1 + bw / 2) / w, (y1 + bh / 2) / h, bw / w, bh / h))
            cv2.imwrite(str(img_dir / f"{split}{k}.jpg"), img)
            with open(lbl_dir / f"{split}{k}.txt", "w") as f:
                for r in rows:
                    f.write(f"{r[0]} {r[1]:.6f} {r[2]:.6f} {r[3]:.6f} {r[4]:.6f}\n")
    data = {"path": str(root), "train": "images/train", "val": "images/val",
            "nc": nc, "names": names}
    yaml_path = root / "data.yaml"
    with open(yaml_path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)
    return yaml_path


def make_dense_dataset(root, n_train=6, n_val=2, imgsz=96, nc=3, seed=0,
                       objects=(50, 200)):
    """Dense-scene corpus (VERDICT r4 #7): 50-200 small boxes per image, the
    regime the realimage corpus (<=3 objects) never exercises. Exact labels;
    boxes may overlap (crowded scenes)."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    names = {i: f"class{i}" for i in range(nc)}
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for k in range(n):
            h = w = imgsz
            img = rng.integers(90, 140, size=(h, w, 3), dtype=np.uint8)
            n_obj = int(rng.integers(objects[0], objects[1] + 1))
            rows = []
            for _ in range(n_obj):
                c = int(rng.integers(0, nc))
                bw = int(rng.integers(4, max(5, w // 10)))
                bh = int(rng.integers(4, max(5, h // 10)))
                x1 = int(rng.integers(0, w - bw))
                y1 = int(rng.integers(0, h - bh))
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh),
                              CLASS_COLORS[c % len(CLASS_COLORS)], -1)
                rows.append((c, (x1 + bw / 2) / w, (y1 + bh / 2) / h,
                             bw / w, bh / h))
            cv2.imwrite(str(img_dir / f"{split}{k}.jpg"), img)
            with open(lbl_dir / f"{split}{k}.txt", "w") as f:
                for r in rows:
                    f.write(f"{r[0]} {r[1]:.6f} {r[2]:.6f} "
                            f"{r[3]:.6f} {r[4]:.6f}\n")
    data = {"path": str(root), "train": "images/train", "val": "images/val",
            "nc": nc, "names": names}
    yaml_path = root / "data.yaml"
    with open(yaml_path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)
    return yaml_path
