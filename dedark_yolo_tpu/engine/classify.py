"""Classification task triple: dataset, trainer, validator.

Counterpart of the reference's classify task (models/yolo/classify/), using the
imagenet-style folder layout root/{train,val}/{class_name}/images. The trainer
is the full BaseTrainer loop (warmup, param groups, accumulation, EMA-val,
checkpoint/resume, EarlyStopping) with a cross-entropy loss; validation reports
top-1/top-5 accuracy (fitness = (top1+top5)/2, reference ClassifyMetrics).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg, model_yaml_load, DEFAULT_CFG_DICT
from ..data.dataset import IMG_FORMATS
from ..data.loader import DataLoader
from ..nn.graph import DetectionModel
from ..utils import LOGGER, increment_dir
from .trainer import BaseTrainer


def check_cls_dataset(root):
    """Resolve an imagenet-style folder dataset (reference data/utils.py
    check_cls_dataset)."""
    root = Path(root)
    out = {"path": str(root)}
    for split in ("train", "val", "test"):
        d = root / split
        if d.is_dir():
            out[split] = str(d)
    train = Path(out.get("train") or out["val"])
    names = sorted(p.name for p in train.iterdir() if p.is_dir())
    out["names"] = {i: n for i, n in enumerate(names)}
    out["nc"] = len(names)
    return out


class ClassificationDataset:
    def __init__(self, split_dir, imgsz=224, names=None):
        import cv2
        self.imgsz = imgsz
        split_dir = Path(split_dir)
        classes = names or {i: p.name for i, p in
                            enumerate(sorted(q for q in split_dir.iterdir()
                                             if q.is_dir()))}
        name_to_id = {v: k for k, v in classes.items()}
        self.samples = []
        for cls_dir in sorted(split_dir.iterdir()):
            if not cls_dir.is_dir() or cls_dir.name not in name_to_id:
                continue
            cid = name_to_id[cls_dir.name]
            for f in sorted(cls_dir.rglob("*")):
                if f.suffix.lower() in IMG_FORMATS:
                    self.samples.append((str(f), cid))
        if not self.samples:
            raise FileNotFoundError(f"no classification images in {split_dir}")

    def __len__(self):
        return len(self.samples)

    def load(self, i, train=False, rng=None):
        import cv2
        import random as _r
        path, cid = self.samples[i]
        from ..utils.patches import imread
        img = imread(path)
        img = cv2.resize(img, (self.imgsz, self.imgsz),
                         interpolation=cv2.INTER_LINEAR)
        if train and rng and rng.random() < 0.5:
            img = np.fliplr(img)
        return np.ascontiguousarray(img[..., ::-1]), cid


def collate_classify(items):
    """items: list of (img HWC uint8, class id) -> {'img', 'cls'}."""
    return {"img": np.stack([p[0] for p in items]),
            "cls": np.asarray([p[1] for p in items], np.int32)}


class ClassificationTrainer(BaseTrainer):
    task = "classify"
    default_model = "yolov8-cls.yaml"
    loss_names = ("loss",)
    metric_keys = ("metrics/accuracy_top1", "metrics/accuracy_top5")

    def check_data(self, path):
        return check_cls_dataset(path)

    def preflight(self):
        # classify uses plain square resize; no stride rounding needed
        if not isinstance(self.args.imgsz, int):
            self.args.imgsz = 224

    def get_model(self):
        model = DetectionModel(self.model_cfg_dict(), nc=self.data["nc"])
        assert model.task == "classify", "model yaml lacks a Classify head"
        return model

    def build_train_loader(self):
        a = self.args
        ds = ClassificationDataset(self.data["train"], a.imgsz, self.data["names"])
        tf = lambda dataset, i, rng: dataset.load(i, train=True, rng=rng)
        return DataLoader(ds, tf, a.batch, seed=a.seed, workers=a.workers,
                          process_index=jax.process_index(),
                          process_count=jax.process_count(),
                          collate_fn=collate_classify)

    def make_loss_fn(self, model):
        a = self.args
        smoothing = float(a.label_smoothing or 0.0)
        nbs = float(a.nbs)

        def loss_fn(p, bs, batch):
            logits, ns = model.apply_train(
                {"params": p, "batch_stats": bs},
                batch["img"].astype(jnp.float32) / 255.0)
            onehot = jax.nn.one_hot(batch["cls"], model.nc)
            if smoothing:
                onehot = onehot * (1 - smoothing) + smoothing / model.nc
            ce = -jnp.sum(jax.nn.log_softmax(logits) * onehot, -1)
            # summed / nbs (reference v8ClassificationLoss loss.py:380-385):
            # summing micro-batch grads then targets an nbs-sized batch, the
            # same convention as the detection loss's *batch_size scaling
            loss = jnp.sum(ce) / nbs
            return loss, ((jax.lax.stop_gradient(loss),), ns)

        return loss_fn

    def get_validator(self):
        return ClassificationValidator(
            args=get_cfg(dict(vars(self.args)), {}),
            save_dir=self.save_dir, data=self.data)

    def dummy_batch(self, b):
        a = self.args
        return {"img": jnp.zeros((b, a.imgsz, a.imgsz, 3), jnp.uint8),
                "cls": jnp.zeros((b,), jnp.int32)}


class ClassificationValidator:
    """Top-1/top-5 accuracy over the val split (reference ClassifyMetrics)."""

    def __init__(self, args=None, save_dir=None, data=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        self.save_dir = (Path(save_dir) if save_dir else
                         increment_dir(Path("runs/classify/val"),
                                       getattr(self.args, "exist_ok", False)))
        self.data = data

    def __call__(self, model=None, params=None, batch_stats=None, mesh=None):
        a = self.args
        data = self.data or check_cls_dataset(a.data)
        imgsz = a.imgsz if isinstance(a.imgsz, int) else 224
        split = a.split if a.split in data else ("val" if "val" in data else "train")
        ds = ClassificationDataset(data[split], imgsz, data["names"])
        batch = max(int(a.batch), 1)
        if not hasattr(self, "_fwd"):
            from .autobackend import AutoBackend
            if isinstance(model, AutoBackend):
                # exported classify artifact: uint8 in -> (probs,)
                self._fwd = lambda p, bs, img: model.forward(img)[0]
            else:
                self._fwd = jax.jit(lambda p, bs, img: model.apply_eval(
                    {"params": p, "batch_stats": bs},
                    img.astype(jnp.float32) / 255.0))
        correct1 = correct5 = total = 0
        k5 = min(5, getattr(model, "nc", None) or len(data["names"]))
        for bi in range(-(-len(ds) // batch)):
            idxs = range(bi * batch, min((bi + 1) * batch, len(ds)))
            pairs = [ds.load(i) for i in idxs]
            if not pairs:
                break
            while len(pairs) < batch:   # pad to the jitted static shape
                pairs.append(pairs[0])
            img = jnp.asarray(np.stack([p[0] for p in pairs]))
            y = np.asarray([p[1] for p in pairs])
            probs = np.asarray(self._fwd(params, batch_stats, img))[:len(idxs)]
            y = y[:len(idxs)]
            topk = np.argsort(-probs, axis=-1)[:, :k5]
            correct1 += int((topk[:, 0] == y).sum())
            correct5 += int(sum(y[i] in topk[i] for i in range(len(y))))
            total += len(y)
        top1 = correct1 / max(total, 1)
        top5 = correct5 / max(total, 1)
        LOGGER.info(f"classify val: {total} images top1 {top1:.3f} top5 {top5:.3f}")
        return {"metrics/accuracy_top1": top1, "metrics/accuracy_top5": top5,
                "fitness": (top1 + top5) / 2}


class ClassificationPredictor:
    """Streaming classify inference -> Results with Probs (reference
    models/yolo/classify/predict.py)."""

    def __init__(self, args=None, model=None, params=None, batch_stats=None,
                 names=None, save_dir=None, members=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.names = names or (model.names if model else {})
        self.save_dir = (Path(save_dir) if save_dir else
                         increment_dir(Path("runs/classify/predict"),
                                       getattr(self.args, "exist_ok", False)))
        self._fwd = None

    def __call__(self, source, stream=False):
        gen = self.stream_inference(source)
        return gen if stream else list(gen)

    def stream_inference(self, source):
        import cv2
        from .predictor import load_source
        from .results import Results
        a = self.args
        imgsz = a.imgsz if isinstance(a.imgsz, int) else 224
        if self._fwd is None:
            model = self.model
            from .autobackend import AutoBackend
            if isinstance(model, AutoBackend):
                # exported classify artifact: uint8 in -> (probs,)
                self._fwd = lambda p, bs, img: model.forward(img)[0]
            else:
                self._fwd = jax.jit(lambda p, bs, img: model.apply_eval(
                    {"params": p, "batch_stats": bs},
                    img.astype(jnp.float32) / 255.0))
        batch = max(int(a.batch), 1)
        buf = []

        def flush():
            nonlocal buf
            if not buf:
                return
            n = len(buf)
            imgs = [cv2.resize(b[1], (imgsz, imgsz))[..., ::-1] for b in buf]
            while len(imgs) < batch:
                imgs.append(imgs[0])
            probs = np.asarray(self._fwd(self.params, self.batch_stats,
                                         jnp.asarray(np.stack(imgs))))
            for i in range(n):
                path, img, _ = buf[i]
                yield Results(orig_img=np.ascontiguousarray(img[..., ::-1]),
                              path=path, names=self.names, probs=probs[i])
            buf = []

        for path, img, meta in load_source(source):
            buf.append((path, img, meta))
            if len(buf) == batch:
                yield from flush()
        yield from flush()
