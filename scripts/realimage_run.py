"""Real-image artifact run (BASELINE config 2/4 hybrid): train -> val the full
dedark loop on bus.jpg derivatives.

The only real photograph shipped offline is the reference repo's bus.jpg
(read-only input; nothing is copied into this repo). We derive a labeled
detection dataset from it: three fixed crops of the photo act as the three
object classes, pasted at random positions/scales onto backgrounds tiled from
other regions of the same photo — real textures everywhere, exact labels by
construction. Training degrades inputs with img**dark_param and runs the full
dedark stack (lowlight_FLAG + dedark_FLAG with computed dark-channel priors),
i.e. the reference's low-light training loop (detect/train.py:70-111).

Usage:
    python scripts/realimage_run.py [--epochs 40] [--imgsz 320] [--out DIR]

Writes runs + a summary line; see docs/REALIMAGE.md for the recorded result.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BUS = Path("/root/reference/bus.jpg")

# fixed crop windows (y0, y1, x0, x1) in the 1080x810 photo — three visually
# distinct regions used as the three "object" classes
CROPS = [(380, 560, 20, 140),    # person (left)
         (360, 620, 660, 790),   # person (right)
         (230, 420, 300, 560)]   # bus front section


def build_dataset(root, n_train=96, n_val=64, imgsz=320, seed=0,
                  val_jitter=True):
    """Multi-scene derivation (round-3: v2 corpus, >=64-image val so severity
    sweeps stop being noise-bound — VERDICT r2 next #10). Scene diversity
    comes from background augmentation (random window + flip/rotation of the
    object-free region) plus scene-level brightness/gamma jitter applied
    AFTER compositing, so every image is a distinct scene built from real
    camera texture; labels stay exact by construction."""
    import cv2
    import yaml
    img = cv2.imread(str(BUS))
    assert img is not None, f"cannot read {BUS}"
    crops = [img[y0:y1, x0:x1] for (y0, y1, x0, x1) in CROPS]
    rng = np.random.default_rng(seed)
    root = Path(root)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for k in range(n):
            # background: random window of the OBJECT-FREE lower region of the
            # photo (all crop windows lie above y=620) — windows overlapping
            # the crop regions would contain unlabeled object copies, i.e.
            # label noise that caps precision
            bh = int(rng.integers(200, 450))
            bw = int(rng.integers(300, 700))
            y0 = int(rng.integers(625, 1080 - bh))
            x0 = int(rng.integers(0, 810 - bw))
            bg = cv2.resize(img[y0:y0 + bh, x0:x0 + bw], (imgsz, imgsz))
            # scene diversity: geometric + photometric jitter of the backdrop
            flip = int(rng.integers(0, 4))
            if flip == 1:
                bg = np.fliplr(bg).copy()
            elif flip == 2:
                bg = np.flipud(bg).copy()
            elif flip == 3:
                bg = np.rot90(bg, 2).copy()
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                c = int(rng.integers(0, 3))
                crop = crops[c]
                scale = rng.uniform(0.35, 0.8) * imgsz / max(crop.shape[:2])
                cw = max(int(crop.shape[1] * scale), 8)
                ch = max(int(crop.shape[0] * scale), 8)
                patch = cv2.resize(crop, (cw, ch))
                px = int(rng.integers(0, imgsz - cw))
                py = int(rng.integers(0, imgsz - ch))
                bg[py:py + ch, px:px + cw] = patch
                rows.append(f"{c} {(px + cw / 2) / imgsz:.6f} "
                            f"{(py + ch / 2) / imgsz:.6f} "
                            f"{cw / imgsz:.6f} {ch / imgsz:.6f}")
            # photometric jitter of the WHOLE composed scene (exposure/curve
            # variation, as a camera would apply it). A first v2 attempt
            # jittered only the background BEFORE pasting; gain>1 backgrounds
            # then out-shone the unjittered objects, and after the **dark
            # gamma crush only the brightest pixels survive — the objects
            # washed out and training collapsed (mAP50 0.25 vs 0.52). Scene-
            # level jitter preserves relative object/background structure.
            # (draws always happen so the rng stream — and therefore every
            # other image in the run — is identical whether or not the
            # jitter is applied; val_jitter=False gives a CONTROLLED-exposure
            # val split for severity claims while train keeps the diversity)
            gain = float(rng.uniform(0.7, 1.25))
            gamma = float(rng.uniform(0.8, 1.25))
            if split == "train" or val_jitter:
                bgf = np.clip((bg.astype(np.float32) / 255.0) ** gamma * gain,
                              0, 1)
                bg = (bgf * 255.0).astype(np.uint8)
            cv2.imwrite(str(root / "images" / split / f"{split}{k}.jpg"), bg)
            (root / "labels" / split / f"{split}{k}.txt").write_text(
                "\n".join(rows) + "\n")
    data = {"path": str(root), "train": "images/train", "val": "images/val",
            "nc": 3, "names": {0: "person_l", 1: "person_r", 2: "bus_front"}}
    yp = root / "data.yaml"
    yp.write_text(yaml.safe_dump(data, sort_keys=False))
    return yp


def degrade_split(root, split, param):
    """Offline low-light degradation of a split's images in place — the
    deployment-shaped setup of BASELINE config 3 (val runs on an actually
    dark dataset, reference utils/lowlight_process.py)."""
    import cv2
    for f in sorted((Path(root) / "images" / split).glob("*.jpg")):
        img = cv2.imread(str(f)).astype(np.float32) / 255.0
        cv2.imwrite(str(f), (np.power(img, param) * 255.0).astype(np.uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dark", type=float, default=5.0)
    ap.add_argument("--out", default="runs/realimage")
    ap.add_argument("--model", default="yolov8n-dedark.yaml")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--control", action="store_true",
                    help="clean-data control run: no degradation, no dedark "
                         "flags — validates the dataset/labels themselves")
    ap.add_argument("--ntrain", type=int, default=96)
    ap.add_argument("--nval", type=int, default=64)
    ap.add_argument("--no-val-jitter", action="store_true",
                    help="controlled-exposure val split (train stays "
                         "jittered): isolates crush severity for the sweep")
    ap.add_argument("--resume", action="store_true",
                    help="continue an interrupted run from <out>/train/weights/"
                         "last.npz (dataset regeneration is seed-deterministic)")
    ap.add_argument("--val-period", type=int, default=1,
                    help="run full val every N epochs (cfg val_period): keeps "
                         "flagship epochs train-bound at scale (VERDICT r4 #3)")
    ap.add_argument("--ckpt-period", type=int, default=1,
                    help="refresh last.npz every N epochs (cfg ckpt_period): "
                         "the full-state gather+serialize competes with the "
                         "train loop for tunnel bandwidth and the host core")
    ap.add_argument("--no-save", action="store_true",
                    help="disable checkpointing entirely (pure-train timing "
                         "probes; docs/REALIMAGE.md v3)")
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from dedark_yolo_tpu import YOLO

    out = Path(args.out)
    yp = build_dataset(out / "data", n_train=args.ntrain, n_val=args.nval,
                       imgsz=args.imgsz, val_jitter=not args.no_val_jitter)
    dedark_kw = dict(lowlight_FLAG=True, dedark_FLAG=True,
                     dark_param=args.dark, prior_mode="computed", lrl=2.0)
    if args.control:
        dedark_kw = dict(lowlight_FLAG=False, dedark_FLAG=False)
    else:
        # val measures on an actually-dark dataset (train degrades on the fly,
        # reference detect/train.py:79; val images are crushed offline)
        degrade_split(out / "data", "val", args.dark)
    m = YOLO(args.model)
    # 48-image dataset = 3 micro-batches/epoch: disable grad accumulation
    # (nbs=batch) and the 100-iteration warmup floor, or the optimizer would
    # apply <1 update/epoch and ramp lr for ~30 epochs
    metrics = m.train(
        data=str(yp), epochs=args.epochs, imgsz=args.imgsz, batch=args.batch,
        nbs=args.batch, warmup_epochs=0, workers=4, max_boxes=16, max_nms=512,
        max_det=30, plots=True, project=str(out), name="train", patience=100,
        resume=args.resume, val_period=args.val_period,
        ckpt_period=args.ckpt_period, save=not args.no_save, **dedark_kw)
    print("FINAL", {k: round(float(v), 4) for k, v in metrics.items()
                    if isinstance(v, (int, float, np.floating))})


if __name__ == "__main__":
    main()
