"""Classification task triple: dataset, trainer, validator.

Counterpart of the reference's classify task (models/yolo/classify/), using the
imagenet-style folder layout root/{train,val}/{class_name}/images. Training is a
jitted cross-entropy step on the same mesh machinery as detection; validation
reports top-1/top-5 accuracy.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg, model_yaml_load, DEFAULT_CFG_DICT
from ..data.dataset import IMG_FORMATS
from ..nn.graph import DetectionModel
from ..parallel import make_mesh, shard_batch, replicate
from ..utils import LOGGER, ema_init, ema_update, save_checkpoint
from .optim import init_opt_state, opt_update, label_params


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
        img = cv2.imread(path)
        img = cv2.resize(img, (self.imgsz, self.imgsz),
                         interpolation=cv2.INTER_LINEAR)
        if train and rng and rng.random() < 0.5:
            img = np.fliplr(img)
        return np.ascontiguousarray(img[..., ::-1]), cid


class ClassificationTrainer:
    def __init__(self, overrides=None):
        self.args = get_cfg(DEFAULT_CFG_DICT, overrides or {})
        self.save_dir = Path(self.args.project or "runs/classify") / \
            (self.args.name or "train")
        self.wdir = self.save_dir / "weights"

    def train(self):
        import random as _random
        a = self.args
        data = check_cls_dataset(a.data)
        imgsz = a.imgsz if isinstance(a.imgsz, int) else 224
        ds = ClassificationDataset(data["train"], imgsz, data["names"])
        val_ds = ClassificationDataset(data.get("val", data["train"]), imgsz,
                                       data["names"])
        model = DetectionModel(model_yaml_load(a.model or "yolov8-cls.yaml"),
                               nc=data["nc"])
        assert model.task == "classify", "model yaml lacks a Classify head"
        self.model = model
        variables = model.init(jax.random.PRNGKey(a.seed), imgsz=imgsz)
        params, batch_stats = variables["params"], variables["batch_stats"]
        labels = label_params(params)
        opt_state = init_opt_state(params)
        ema = ema_init(params)
        emu = jnp.zeros((), jnp.int32)
        mesh = make_mesh(devices=jax.devices()[:1]) if a.batch % len(jax.devices()) \
            else make_mesh()

        def loss_fn(p, bs, img, y):
            logits, ns = model.apply_train({"params": p, "batch_stats": bs},
                                           img.astype(jnp.float32) / 255.0)
            onehot = jax.nn.one_hot(y, model.nc)
            if a.label_smoothing:
                onehot = onehot * (1 - a.label_smoothing) + \
                    a.label_smoothing / model.nc
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))
            return loss, ns

        def step(p, bs, os_, ema, emu, img, y, lr):
            (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, img, y)
            p, os_ = opt_update(p, g, os_, labels, kind="sgd", lr_bias=lr, lr=lr,
                                momentum=jnp.float32(a.momentum),
                                weight_decay=a.weight_decay, accumulate=1)
            ema, emu = ema_update(ema, p, emu)
            return p, ns, os_, ema, emu, loss

        jstep = jax.jit(step, donate_argnums=(0, 1, 2, 3, 4))
        params = replicate(mesh, params)
        batch_stats = replicate(mesh, batch_stats)
        opt_state = replicate(mesh, opt_state)
        ema = replicate(mesh, ema)

        n = len(ds)
        self.wdir.mkdir(parents=True, exist_ok=True)
        for epoch in range(a.epochs):
            order = list(range(n))
            _random.Random(a.seed + epoch).shuffle(order)
            rng = _random.Random(a.seed * 7 + epoch)
            losses = []
            for bi in range(n // a.batch):
                idxs = order[bi * a.batch:(bi + 1) * a.batch]
                pairs = [ds.load(i, train=True, rng=rng) for i in idxs]
                img = jnp.asarray(np.stack([p[0] for p in pairs]))
                y = jnp.asarray(np.asarray([p[1] for p in pairs], np.int32))
                batch = shard_batch(mesh, {"img": img, "y": y})
                lr = jnp.float32(a.lr0 * max(1 - epoch / a.epochs, 0.01))
                out = jstep(params, batch_stats, opt_state, ema, emu,
                            batch["img"], batch["y"], lr)
                params, batch_stats, opt_state, ema, emu = out[:5]
                losses.append(out[5])
            top1, top5 = self._validate(model, ema, batch_stats, val_ds, a.batch)
            LOGGER.info(f"epoch {epoch + 1}/{a.epochs} "
                        f"loss {float(jnp.mean(jnp.stack(losses))):.4f} "
                        f"top1 {top1:.3f} top5 {top5:.3f}")
        save_checkpoint(self.wdir / "last.npz",
                        params=jax.tree_util.tree_map(np.asarray, params),
                        batch_stats=jax.tree_util.tree_map(np.asarray, batch_stats),
                        ema_params=jax.tree_util.tree_map(np.asarray, ema),
                        train_args=dict(vars(a)), model_yaml=model.yaml)
        return {"metrics/accuracy_top1": top1, "metrics/accuracy_top5": top5}

    def _validate(self, model, params, batch_stats, val_ds, batch):
        correct1 = correct5 = total = 0
        fwd = jax.jit(lambda p, bs, img: model.apply_eval(
            {"params": p, "batch_stats": bs}, img.astype(jnp.float32) / 255.0))
        k5 = min(5, model.nc)
        for bi in range(max(len(val_ds) // batch, 1)):
            idxs = range(bi * batch, min((bi + 1) * batch, len(val_ds)))
            pairs = [val_ds.load(i) for i in idxs]
            if not pairs:
                break
            img = jnp.asarray(np.stack([p[0] for p in pairs]))
            y = np.asarray([p[1] for p in pairs])
            probs = np.asarray(fwd(params, batch_stats, img))
            topk = np.argsort(-probs, axis=-1)[:, :k5]
            correct1 += int((topk[:, 0] == y).sum())
            correct5 += int(sum(y[i] in topk[i] for i in range(len(y))))
            total += len(y)
        return correct1 / max(total, 1), correct5 / max(total, 1)
