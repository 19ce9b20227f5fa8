"""Parity-by-execution for the SEGMENT and POSE tasks.

scripts/reference_duel.py proved mAP parity for detect by running the
reference's own DetectionValidator offline on shared weights. This script
extends that proof to the other matched-metric tasks:

  1. generate a deterministic synthetic dataset (polygon instances for
     segment; box+3-keypoint figures for pose),
  2. train OUR tiny task model on it (SegmentationTrainer / PoseTrainer),
  3. export the weights to a torch state_dict (export_state_dict) and load
     them into the reference's SegmentationModel / PoseModel built from the
     SAME yaml (reference tasks.py:220-257, parse_model 803-921),
  4. forward-parity check one val image (decoded head outputs + protos /
     decoded keypoints),
  5. run the reference SegmentationValidator / PoseValidator
     (reference segment/val.py:17-160, pose/val.py:17-160) on torch CPU and
     OUR validator with identical settings (conf=0.001, iou=0.7, rect=False,
     overlap masks, mask_ratio 4),
  6. report both stacks' box/mask/pose mAPs side by side.

Protocol notes (why bit-parity is the expectation, not luck):
  * boxes are matched in NATIVE image space on both sides
    (reference segment/val.py:90-103 scale_boxes; ours engine/segment.py),
  * mask IoU lives in the proto frame (s/4) on both sides
    (reference _process_batch masks=True downsamples GT; ours rasterizes GT
    at mask_ratio and crops predicted masks by box exactly like
    ops.process_mask),
  * pose OKS uses area*0.53 and sigma=1/nkpt (nkpt != 17) in native space on
    both sides (reference pose/val.py:121-128; ours engine/pose.py kpt_oks).

Missing reference deps are stubbed by scripts/ref_compat.py.

Usage:
    python scripts/reference_duel_tasks.py [--task segment|pose|classify|all]
(forces the CPU platform itself; the sitecustomize-pinned axon platform
ignores JAX_PLATFORMS alone)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

IMGSZ = 128
H0, W0 = 128, 256          # wide non-square natives: letterbox is exercised
# NOTE instance radii must survive proto-space downsampling: letterbox scale
# is IMGSZ/W0 = 0.5 and protos are /4, so a radius-36 instance is ~4.5 px in
# the mask-IoU frame — small radii make mask mAP structurally zero BOTH ways
VAL_SETTINGS = dict(conf=0.001, iou=0.7, max_det=30, rect=False, plots=False)

SEG_TINY = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C2f", [32, True]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
    ],
    "head": [[[3, 4, 5], 1, "Segment", ["nc", 8, 32]]],
}
POSE_TINY = {
    "nc": 1,
    "kpt_shape": [3, 3],
    "backbone": SEG_TINY["backbone"],
    "head": [[[3, 4, 5], 1, "Pose", ["nc", [3, 3]]]],
}
CLS_TINY = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[-1, 1, "Classify", ["nc"]]],
}


def make_seg_dataset(root: Path):
    """8-gon colored instances on noise; labels are normalized polygons."""
    import cv2
    import yaml
    rng = np.random.default_rng(11)
    colors = [(225, 60, 60), (60, 225, 60)]
    for split, n in (("train", 16), ("val", 8)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for k in range(n):
            img = rng.integers(90, 130, (H0, W0, 3), dtype=np.uint8)
            rows = []
            for _ in range(int(rng.integers(1, 3))):
                c = int(rng.integers(0, 2))
                cx = int(rng.integers(52, W0 - 52))
                cy = int(rng.integers(48, H0 - 48))
                r = int(rng.integers(28, 46))
                ang = np.linspace(0, 2 * np.pi, 9)[:-1] + rng.uniform(0, 0.7)
                rr = r * rng.uniform(0.8, 1.0, 8)
                pts = np.stack([cx + rr * np.cos(ang), cy + rr * np.sin(ang)], 1)
                cv2.fillPoly(img, [pts.astype(np.int32)], colors[c])
                norm = (pts / np.asarray([W0, H0])).clip(0, 1).reshape(-1)
                rows.append(f"{c} " + " ".join(f"{v:.5f}" for v in norm))
            cv2.imwrite(str(root / "images" / split / f"{split}{k}.jpg"), img)
            (root / "labels" / split / f"{split}{k}.txt").write_text(
                "\n".join(rows) + "\n")
    (root / "data.yaml").write_text(yaml.safe_dump(
        {"path": str(root.resolve()), "train": "images/train",
         "val": "images/val", "nc": 2, "names": {0: "red", 1: "green"}},
        sort_keys=False))
    return root / "data.yaml"


def make_pose_dataset(root: Path):
    """Vertical 3-dot figures; labels are box + 3 visible keypoints."""
    import cv2
    import yaml
    rng = np.random.default_rng(13)
    for split, n in (("train", 16), ("val", 8)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for k in range(n):
            img = rng.integers(90, 130, (H0, W0, 3), dtype=np.uint8)
            rows = []
            for _ in range(int(rng.integers(1, 3))):
                # figures must survive the 0.5 letterbox scale: r=7 dots and a
                # filled body, or the tiny model detects nothing on held-out val
                cx = int(rng.integers(70, W0 - 70))
                cy = int(rng.integers(48, H0 - 48))
                pts = [(cx, cy - 26), (cx, cy), (cx, cy + 26)]
                cv2.rectangle(img, (cx - 22, cy - 36), (cx + 22, cy + 36),
                              (60, 60, 230), -1)
                for p in pts:
                    cv2.circle(img, p, 7, (250, 220, 60), -1)
                rows.append(
                    f"0 {cx / W0:.5f} {cy / H0:.5f} {52 / W0:.5f} {84 / H0:.5f} "
                    + " ".join(f"{x / W0:.5f} {y / H0:.5f} 2" for x, y in pts))
            cv2.imwrite(str(root / "images" / split / f"{split}{k}.jpg"), img)
            (root / "labels" / split / f"{split}{k}.txt").write_text(
                "\n".join(rows) + "\n")
    (root / "data.yaml").write_text(yaml.safe_dump(
        {"path": str(root.resolve()), "train": "images/train",
         "val": "images/val", "nc": 1, "names": {0: "figure"},
         # the reference pose dataset requires these two keys
         "kpt_shape": [3, 3], "flip_idx": [0, 1, 2]},
        sort_keys=False))
    return root / "data.yaml"


def make_cls_dataset(root: Path):
    """ImageFolder layout; 3 classes = colored shapes on noise, SQUARE natives
    (so our plain-resize val preprocessing and any center-crop agree)."""
    import cv2
    rng = np.random.default_rng(17)
    sz = IMGSZ  # native == imgsz: no resampling ambiguity between stacks
    for split, n_per in (("train", 10), ("val", 4)):
        for cid, name in enumerate(["disc", "square", "cross"]):
            d = root / split / name
            d.mkdir(parents=True, exist_ok=True)
            for k in range(n_per):
                # shared random color + heavy noise: the class signal is SHAPE
                # only, so a briefly-trained tiny model lands mid-range top1
                # (a saturated 1.0 == 1.0 duel would prove nothing)
                img = rng.integers(60, 190, (sz, sz, 3), dtype=np.uint8)
                cx = int(rng.integers(40, sz - 40))
                cy = int(rng.integers(40, sz - 40))
                col = tuple(int(v) for v in rng.integers(150, 255, 3))
                r = int(rng.integers(14, 26))
                if cid == 0:
                    cv2.circle(img, (cx, cy), r, col, -1)
                elif cid == 1:
                    cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r),
                                  col, -1)
                else:
                    cv2.line(img, (cx - r, cy), (cx + r, cy), col, 7)
                    cv2.line(img, (cx, cy - r), (cx, cy + r), col, 7)
                cv2.imwrite(str(d / f"{split}{k}.jpg"), img)
    return root


def train_ours(task: str, model_yaml: Path, data_yaml: Path, run_dir: Path):
    ckpt = run_dir / "train" / "weights" / "last.npz"
    if ckpt.is_file():
        print(f"[{task}] reusing trained ckpt {ckpt}")
        return ckpt
    # overfit the tiny synthetic set hard: nbs=batch (no accumulation, one
    # optimizer step per batch), explicit adamw so the auto rule can't shrink
    # lr0, short warmup — the duel needs mid-range mAP, not generalization
    cfg = {"model": str(model_yaml), "data": str(data_yaml), "epochs": 40,
           "imgsz": IMGSZ, "batch": 8, "nbs": 8, "optimizer": "adamw",
           "lr0": 0.01, "warmup_epochs": 2, "max_boxes": 8,
           "max_nms": 256, "max_det": 30, "project": str(run_dir),
           "plots": False, "val": False, "mosaic": 0.0, "fliplr": 0.0,
           "scale": 0.0, "translate": 0.0, "hsv_h": 0.0, "hsv_s": 0.0,
           "hsv_v": 0.0}
    if task == "segment":
        from dedark_yolo_tpu.engine.segment import SegmentationTrainer
        cfg["mask_ratio"] = 4
        SegmentationTrainer(cfg).train()
    elif task == "pose":
        from dedark_yolo_tpu.engine.pose import PoseTrainer
        PoseTrainer(cfg).train()
    else:
        from dedark_yolo_tpu.engine.classify import ClassificationTrainer
        for k in ("max_boxes", "max_nms", "max_det"):
            cfg.pop(k)
        cfg["epochs"] = 60   # shape-only task: mid-range (non-saturated) top1
        ClassificationTrainer(cfg).train()
    return ckpt


def val_ours(task: str, ckpt: Path, data_yaml: Path):
    from dedark_yolo_tpu import YOLO
    m = YOLO(str(ckpt))
    res = m.val(data=str(data_yaml), imgsz=IMGSZ, batch=8,
                project="runs/taskduel", name=f"ours_{task}", exist_ok=True,
                **VAL_SETTINGS)
    return res, m


def build_reference_model(task: str, cfg_dict: dict, names: dict):
    from ultralytics.nn.tasks import PoseModel, SegmentationModel
    cfg = dict(cfg_dict)
    if task == "segment":
        ref = SegmentationModel(cfg, ch=3, nc=cfg["nc"], verbose=False)
    else:
        ref = PoseModel(cfg, ch=3, nc=cfg["nc"],
                        data_kpt_shape=tuple(cfg["kpt_shape"]), verbose=False)
    ref.names = names
    return ref


# ONE definition of the export -> load_state_dict -> missing/unexpected-key
# audit, shared with the detect duel (scripts/ is on sys.path above)
from reference_duel import load_weights_into_reference  # noqa: E402


def forward_parity(task: str, ref_model, our_yolo, image_path: Path):
    """Decoded eval outputs of both stacks on one letterboxed val image."""
    import cv2
    import jax.numpy as jnp
    import torch

    from dedark_yolo_tpu.data.augment import letterbox
    img = cv2.imread(str(image_path))
    assert img is not None, image_path
    lb = letterbox(img, (IMGSZ, IMGSZ))
    lb = lb[0] if isinstance(lb, tuple) else lb
    rgb = cv2.cvtColor(lb, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

    ref_model.eval()
    with torch.no_grad():
        y = ref_model(torch.from_numpy(rgb.transpose(2, 0, 1)[None]))
    ref_cat = (y[0] if isinstance(y, (tuple, list)) else y).numpy()

    variables = {"params": our_yolo.params, "batch_stats": our_yolo.batch_stats}
    outs = our_yolo.model.eval_outputs(variables, jnp.asarray(rgb)[None])
    errs = {}
    if task == "segment":
        boxes, scores, coefs, protos = [np.asarray(o) for o in outs]
        ours = np.concatenate([boxes, scores, coefs], -1).transpose(0, 2, 1)
        assert ours.shape == ref_cat.shape, (ours.shape, ref_cat.shape)
        errs["box_px"] = float(np.abs(ours[:, :4] - ref_cat[:, :4]).max())
        errs["cls"] = float(np.abs(ours[:, 4:6] - ref_cat[:, 4:6]).max())
        errs["coef"] = float(np.abs(ours[:, 6:] - ref_cat[:, 6:]).max())
        ref_protos = (y[1][-1] if len(y[1]) == 3 else y[1]).numpy()
        errs["proto"] = float(
            np.abs(protos.transpose(0, 3, 1, 2) - ref_protos).max())
    else:
        boxes, scores, kpts = [np.asarray(o) for o in outs]
        nk = kpts.shape[2] * kpts.shape[3]
        ours = np.concatenate(
            [boxes, scores, kpts.reshape(kpts.shape[0], -1, nk)],
            -1).transpose(0, 2, 1)
        assert ours.shape == ref_cat.shape, (ours.shape, ref_cat.shape)
        errs["box_px"] = float(np.abs(ours[:, :4] - ref_cat[:, :4]).max())
        errs["cls"] = float(np.abs(ours[:, 4:5] - ref_cat[:, 4:5]).max())
        errs["kpt_px"] = float(np.abs(ours[:, 5:] - ref_cat[:, 5:]).max())
    return errs


def run_reference_val(task: str, ref_model, data_yaml: Path, save_dir: Path):
    from ultralytics.cfg import get_cfg
    if task == "segment":
        from ultralytics.models.yolo.segment import SegmentationValidator as V
    else:
        from ultralytics.models.yolo.pose import PoseValidator as V
    args = get_cfg(overrides=dict(
        data=str(data_yaml), imgsz=IMGSZ, batch=8, device="cpu", half=False,
        max_det=VAL_SETTINGS["max_det"], conf=0.001, iou=0.7, rect=False,
        plots=False, save_json=False, save_txt=False, save_hybrid=False,
        verbose=False, mode="val", task=task, mask_ratio=4, overlap_mask=True))
    v = V(save_dir=Path(save_dir), args=args)
    return v(model=ref_model), v


def duel_classify():
    """Classify parity-by-execution.

    The reference's standalone classify val is broken in the fork — its
    ClassificationValidator.build_dataset references `ClassificationDataset`
    (classify/val.py:63), which exists nowhere in the tree (NameError). Its
    validator still runs when handed a prebuilt dataloader, which is exactly
    how the reference's own trainer drives it — so the duel supplies a shared
    torch dataloader replicating our val preprocessing (BGR imread, INTER_LINEAR
    square resize, RGB, /255) and proves model export + top1/top5 metric
    parity through the reference's own ClassifyMetrics."""
    import cv2
    import torch
    import yaml as pyyaml

    base = REPO / "runs" / "taskduel" / "classify"
    base.mkdir(parents=True, exist_ok=True)
    model_yaml = base / "cls_tiny.yaml"
    model_yaml.write_text(pyyaml.safe_dump(CLS_TINY))
    data_root = base / "data"
    if not (data_root / "val").is_dir():
        make_cls_dataset(data_root)

    ckpt = train_ours("classify", model_yaml, data_root, base)
    print("== [classify] our stack: standalone val ==")
    from dedark_yolo_tpu import YOLO
    m = YOLO(str(ckpt))
    ours = m.val(data=str(data_root), imgsz=IMGSZ, batch=6,
                 project="runs/taskduel", name="ours_classify", exist_ok=True,
                 plots=False)

    print("== [classify] reference model + exported weights ==")
    from ultralytics.nn.tasks import ClassificationModel
    names = {i: n for i, n in enumerate(["disc", "square", "cross"])}
    ref_model = ClassificationModel(cfg=dict(CLS_TINY), ch=3,
                                    nc=CLS_TINY["nc"], verbose=False)
    ref_model.names = names
    n = load_weights_into_reference(ref_model, m)
    print(f"loaded {n} tensors into the reference model")

    # shared preprocessing (mirrors our ClassificationDataset.load)
    def load_img(path):
        img = cv2.imread(str(path))
        img = cv2.resize(img, (IMGSZ, IMGSZ), interpolation=cv2.INTER_LINEAR)
        return np.ascontiguousarray(img[..., ::-1]).astype(np.float32) / 255.0

    val_dirs = sorted((data_root / "val").iterdir())
    samples = [(p, cid) for cid, d in enumerate(val_dirs)
               for p in sorted(d.glob("*.jpg"))]

    import jax.numpy as jnp
    rgb = load_img(samples[0][0])
    ref_model.eval()
    with torch.no_grad():
        yt = ref_model(torch.from_numpy(rgb.transpose(2, 0, 1)[None])).numpy()
    probs = np.asarray(m.model.apply_eval(
        {"params": m.params, "batch_stats": m.batch_stats},
        jnp.asarray(rgb)[None]))
    errs = {"prob": float(np.abs(probs - yt).max())}
    print(f"forward parity on {samples[0][0].name}: prob={errs['prob']:.2e}")

    print("== [classify] reference stack: its own validator (torch CPU) ==")

    class DuelClsDataset(torch.utils.data.Dataset):
        def __len__(self):
            return len(samples)

        def __getitem__(self, i):
            p, cid = samples[i]
            return {"img": torch.from_numpy(load_img(p).transpose(2, 0, 1)),
                    "cls": torch.tensor(cid, dtype=torch.long)}

    dl = torch.utils.data.DataLoader(DuelClsDataset(), batch_size=6,
                                     shuffle=False, num_workers=0)
    from ultralytics.cfg import get_cfg
    from ultralytics.models.yolo.classify import ClassificationValidator as V
    args = get_cfg(overrides=dict(
        data=str(data_root), imgsz=IMGSZ, batch=6, device="cpu", half=False,
        plots=False, verbose=False, mode="val", task="classify"))
    v = V(dataloader=dl, save_dir=base / "ref", args=args)
    ref_stats = v(model=ref_model)

    row = {
        "task": "classify",
        "ours": {"top1": float(ours["metrics/accuracy_top1"]),
                 "top5": float(ours["metrics/accuracy_top5"])},
        "reference": {"top1": float(ref_stats["metrics/accuracy_top1"]),
                      "top5": float(ref_stats["metrics/accuracy_top5"])},
        "forward_parity": errs,
        "config": {"imgsz": IMGSZ, "note":
                   "reference standalone classify val is broken in the fork "
                   "(classify/val.py:63 NameError) — dataloader supplied, "
                   "matching how its own trainer drives the validator"},
    }
    print(json.dumps(row, indent=2))
    for k in row["ours"]:
        print(f"Δ {k} = {abs(row['ours'][k] - row['reference'][k]):.6f}")
    (base / "duel.json").write_text(json.dumps(row, indent=2))
    return row


def duel(task: str):
    if task == "classify":
        return duel_classify()
    import yaml as pyyaml
    base = REPO / "runs" / "taskduel" / task
    base.mkdir(parents=True, exist_ok=True)
    cfg_dict = SEG_TINY if task == "segment" else POSE_TINY
    model_yaml = base / f"{task}_tiny.yaml"
    model_yaml.write_text(pyyaml.safe_dump(cfg_dict))
    data_root = base / "data"
    data_yaml = (data_root / "data.yaml" if (data_root / "data.yaml").is_file()
                 else (make_seg_dataset(data_root) if task == "segment"
                       else make_pose_dataset(data_root)))

    ckpt = train_ours(task, model_yaml, data_yaml, base)
    print(f"== [{task}] our stack: standalone val ==")
    ours_metrics, our_yolo = val_ours(task, ckpt, data_yaml)

    print(f"== [{task}] reference model + exported weights ==")
    names = {i: str(n) for i, n in
             enumerate(pyyaml.safe_load(data_yaml.read_text())["names"].values())}
    ref_model = build_reference_model(task, cfg_dict, names)
    n = load_weights_into_reference(ref_model, our_yolo)
    print(f"loaded {n} tensors into the reference model")

    first_img = sorted((data_root / "images" / "val").glob("*.jpg"))[0]
    errs = forward_parity(task, ref_model, our_yolo, first_img)
    print(f"forward parity on {first_img.name}: "
          + " ".join(f"{k}={v:.2e}" for k, v in errs.items()))

    print(f"== [{task}] reference stack: standalone val (torch CPU) ==")
    ref_stats, _ = run_reference_val(task, ref_model, data_yaml, base / "ref")

    sfx = "M" if task == "segment" else "P"
    row = {
        "task": task,
        "ours": {
            "map50_box": float(ours_metrics["metrics/mAP50(B)"]),
            "map_box": float(ours_metrics["metrics/mAP50-95(B)"]),
            f"map50_{sfx}": float(ours_metrics[f"metrics/mAP50({sfx})"]),
            f"map_{sfx}": float(ours_metrics[f"metrics/mAP50-95({sfx})"]),
        },
        "reference": {
            "map50_box": float(ref_stats["metrics/mAP50(B)"]),
            "map_box": float(ref_stats["metrics/mAP50-95(B)"]),
            f"map50_{sfx}": float(ref_stats[f"metrics/mAP50({sfx})"]),
            f"map_{sfx}": float(ref_stats[f"metrics/mAP50-95({sfx})"]),
        },
        "forward_parity": errs,
        "config": {"imgsz": IMGSZ, **VAL_SETTINGS},
    }
    print(json.dumps(row, indent=2))
    for k in row["ours"]:
        d = abs(row["ours"][k] - row["reference"][k])
        print(f"Δ {k} = {d:.6f}")
    (base / "duel.json").write_text(json.dumps(row, indent=2))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="all",
                    choices=["segment", "pose", "classify", "all"])
    args = ap.parse_args()

    # the sitecustomize-pinned axon platform ignores the env var alone —
    # the config update is required too (same as reference_duel.py --cpu)
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from ref_compat import import_reference
    ultra = import_reference(config_dir="runs/taskduel/.config")
    print(f"reference ultralytics {ultra.__version__} from {ultra.__file__}")

    tasks = (["segment", "pose", "classify"] if args.task == "all"
             else [args.task])
    rows = [duel(t) for t in tasks]
    out = REPO / "runs" / "taskduel" / "duel_tasks.json"
    out.write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
