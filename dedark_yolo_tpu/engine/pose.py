"""Pose task triple: trainer + validator over the Pose head.

Counterpart of the reference's models/yolo/pose/ task. Validation reports box
mAP and pose mAP (OKS-based TP at the 10 standard thresholds, mirroring the
reference PoseValidator's kpt_iou matching)."""

from __future__ import annotations

import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg, model_yaml_load, DEFAULT_CFG_DICT
from ..data.pose import PoseDataset, collate_pose
from ..losses.segment import pose_loss, OKS_SIGMA
from ..nn.graph import DetectionModel
from ..nn.heads import decode_detections, decode_keypoints
from ..ops.nms import non_max_suppression
from ..parallel import make_mesh, shard_batch, replicate
from ..utils import (LOGGER, DetMetrics, ema_init, ema_update, save_checkpoint,
                     match_predictions)
from .optim import init_opt_state, opt_update, label_params


def kpt_oks(gt_kpts, pred_kpts, area, sigmas):
    """Object keypoint similarity between (n_gt, nk, 3) and (n_pred, nk, 3)
    pixel keypoints -> (n_gt, n_pred). Reference metrics.py kpt_iou."""
    d = ((gt_kpts[:, None, :, 0] - pred_kpts[None, :, :, 0]) ** 2 +
         (gt_kpts[:, None, :, 1] - pred_kpts[None, :, :, 1]) ** 2)
    vis = gt_kpts[:, None, :, 2] > 0
    e = d / (2 * sigmas[None, None]) ** 2 / (area[:, None, None] + 1e-9) / 2
    oks = np.exp(-e) * vis
    return oks.sum(-1) / np.maximum(vis.sum(-1), 1)


class PoseTrainer:
    def __init__(self, overrides=None):
        self.args = get_cfg(DEFAULT_CFG_DICT, overrides or {})
        self.save_dir = Path(self.args.project or "runs/pose") / \
            (self.args.name or "train")
        self.wdir = self.save_dir / "weights"

    def train(self):
        a = self.args
        from ..data import check_det_dataset
        data = check_det_dataset(a.data)
        model = DetectionModel(model_yaml_load(a.model or "yolov8-pose.yaml"),
                               nc=data["nc"])
        assert model.task == "pose", "model yaml lacks a Pose head"
        self.model = model
        kpt_shape = model.head.get("args", (None, (17, 3)))[1] \
            if len(model.head.get("args", ())) > 1 else (17, 3)
        kpt_shape = tuple(kpt_shape)
        nk = kpt_shape[0]
        ds = PoseDataset(data["train"], imgsz=a.imgsz, nc=data["nc"],
                         kpt_shape=kpt_shape)
        variables = model.init(jax.random.PRNGKey(a.seed), imgsz=a.imgsz)
        params, batch_stats = variables["params"], variables["batch_stats"]
        labels = label_params(params)
        opt_state = init_opt_state(params)
        ema = ema_init(params)
        emu = jnp.zeros((), jnp.int32)
        mesh = make_mesh(devices=jax.devices()[:1])
        hyp = {"box": a.box, "cls": a.cls, "dfl": a.dfl, "pose": a.pose,
               "kobj": a.kobj}

        def loss_fn(p, bs, batch):
            img = batch["img"].astype(jnp.float32) / 255.0
            (det, kpts), ns = model.apply_train(
                {"params": p, "batch_stats": bs}, img)
            total, items = pose_loss(det, kpts, batch, nc=model.nc,
                                     strides=model.strides, hyp=hyp,
                                     kpt_shape=kpt_shape,
                                     max_fg=min(a.max_boxes * 4, 128))
            return total, (items, ns)

        def step(p, bs, os_, ema, emu, batch, lr):
            (t, (items, ns)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bs, batch)
            p, os_ = opt_update(p, g, os_, labels, kind="sgd", lr_bias=lr, lr=lr,
                                momentum=jnp.float32(a.momentum),
                                weight_decay=a.weight_decay, accumulate=1)
            ema, emu = ema_update(ema, p, emu)
            return p, ns, os_, ema, emu, t

        jstep = jax.jit(step, donate_argnums=(0, 1, 2, 3, 4))
        params = replicate(mesh, params)
        batch_stats = replicate(mesh, batch_stats)
        opt_state = replicate(mesh, opt_state)
        ema = replicate(mesh, ema)

        n = len(ds)
        self.wdir.mkdir(parents=True, exist_ok=True)
        for epoch in range(a.epochs):
            order = list(range(n))
            random.Random(a.seed + epoch).shuffle(order)
            rng = random.Random(a.seed * 17 + epoch)
            losses = []
            for bi in range(max(n // a.batch, 1)):
                idxs = order[bi * a.batch:(bi + 1) * a.batch] or order[:a.batch]
                items = [ds.load(i, fliplr_p=0.0, train=True, rng=rng)
                         for i in idxs]
                batch = collate_pose(items, max_boxes=a.max_boxes, nk=nk)
                batch = shard_batch(mesh, batch)
                lr = jnp.float32(a.lr0 * max(1 - epoch / max(a.epochs, 1), 0.01))
                out = jstep(params, batch_stats, opt_state, ema, emu, batch, lr)
                params, batch_stats, opt_state, ema, emu = out[:5]
                losses.append(out[5])
            LOGGER.info(f"epoch {epoch + 1}/{a.epochs} "
                        f"loss {float(jnp.mean(jnp.stack(losses))):.4f}")
        save_checkpoint(self.wdir / "last.npz",
                        params=jax.tree_util.tree_map(np.asarray, params),
                        batch_stats=jax.tree_util.tree_map(np.asarray, batch_stats),
                        ema_params=jax.tree_util.tree_map(np.asarray, ema),
                        train_args=dict(vars(a)), model_yaml=model.yaml)
        metrics = {}
        if a.val:
            validator = PoseValidator(args=a, save_dir=self.save_dir, data=data)
            metrics = validator(model=model, params=ema, batch_stats=batch_stats,
                                kpt_shape=kpt_shape)
        self.metrics = metrics
        return metrics


class PoseValidator:
    def __init__(self, args=None, save_dir=None, data=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        self.save_dir = Path(save_dir or "runs/pose/val")
        self.data = data

    def __call__(self, model=None, params=None, batch_stats=None,
                 kpt_shape=(17, 3)):
        a = self.args
        from ..data import check_det_dataset
        data = self.data or check_det_dataset(a.data)
        nk = kpt_shape[0]
        ds = PoseDataset(data[a.split], imgsz=a.imgsz, nc=data["nc"],
                         kpt_shape=kpt_shape)
        conf = float(a.conf if a.conf is not None else 0.001)
        sigmas = (np.asarray(OKS_SIGMA) if nk == 17
                  else np.ones(nk, np.float32) / nk)

        @jax.jit
        def val_step(params, batch_stats, img):
            x = img.astype(jnp.float32) / 255.0
            det, kpt_maps = model.module.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False)
            boxes, scores = decode_detections(det, model.nc, model.strides,
                                              model.reg_max)
            dets, counts = non_max_suppression(
                boxes, scores, conf_thres=conf, iou_thres=float(a.iou),
                max_det=int(a.max_det), max_nms=int(a.max_nms), multi_label=True)
            kpts = decode_keypoints(kpt_maps, model.strides, kpt_shape)
            return dets, counts, kpts

        box_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        kpt_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        iouv = np.linspace(0.5, 0.95, 10)
        n_images = 0
        bs = max(int(a.batch), 1)
        from ..ops.anchors import make_anchors
        for start in range(0, len(ds), bs):
            idxs = list(range(start, min(start + bs, len(ds))))
            items = [ds.load(i) for i in idxs]
            while len(items) < bs:
                items.append(items[0])
            batch = collate_pose(items, max_boxes=a.max_boxes, nk=nk)
            dets, counts, kpts = jax.tree_util.tree_map(
                np.asarray, val_step(params, batch_stats,
                                     jnp.asarray(batch["img"])))
            s = batch["img"].shape[1]
            feat_shapes = [(s // st, s // st) for st in model.strides]
            anchors, stride_t = make_anchors(feat_shapes, model.strides, 0.5)
            anc = np.asarray(anchors) * np.asarray(stride_t)
            for i in range(len(idxs)):
                n_images += 1
                k = int(counts[i])
                det = dets[i, :k]
                m = batch["mask_gt"][i] > 0
                gt_xywh = batch["bboxes"][i][m] * s
                gt_cls = batch["cls"][i][m]
                gt_k = batch["keypoints"][i][m] * np.asarray([s, s, 1.0])
                gt_xyxy = np.stack([gt_xywh[:, 0] - gt_xywh[:, 2] / 2,
                                    gt_xywh[:, 1] - gt_xywh[:, 3] / 2,
                                    gt_xywh[:, 0] + gt_xywh[:, 2] / 2,
                                    gt_xywh[:, 1] + gt_xywh[:, 3] / 2], 1) \
                    if len(gt_xywh) else np.zeros((0, 4), np.float32)
                tp_box = match_predictions(det[:, :4], det[:, 5], gt_xyxy, gt_cls)
                box_stats["tp"].append(tp_box)
                box_stats["conf"].append(det[:, 4])
                box_stats["pred_cls"].append(det[:, 5])
                box_stats["target_cls"].append(gt_cls)
                # per-detection keypoints: nearest anchor by center
                correct = np.zeros((k, 10), bool)
                if k and len(gt_cls):
                    cx = (det[:, 0] + det[:, 2]) / 2
                    cy = (det[:, 1] + det[:, 3]) / 2
                    d2 = ((anc[None, :, 0] - cx[:, None]) ** 2 +
                          (anc[None, :, 1] - cy[:, None]) ** 2)
                    pk = kpts[i][d2.argmin(1)]      # (k, nk, 3) pixels
                    area = gt_xywh[:, 2] * gt_xywh[:, 3] * 0.53
                    oks = kpt_oks(gt_k, pk, area, sigmas)     # (n_gt, k)
                    oks = oks * (gt_cls[:, None] == det[None, :, 5])
                    for t_i, t in enumerate(iouv):
                        matches = np.array(np.nonzero(oks >= t)).T
                        if matches.shape[0]:
                            order = oks[matches[:, 0], matches[:, 1]].argsort()[::-1]
                            matches = matches[order]
                            matches = matches[np.unique(matches[:, 1],
                                                        return_index=True)[1]]
                            matches = matches[np.unique(matches[:, 0],
                                                        return_index=True)[1]]
                            correct[matches[:, 1].astype(int), t_i] = True
                kpt_stats["tp"].append(correct)
                kpt_stats["conf"].append(det[:, 4])
                kpt_stats["pred_cls"].append(det[:, 5])
                kpt_stats["target_cls"].append(gt_cls)

        results = {}
        for name, stats in (("B", box_stats), ("P", kpt_stats)):
            dm = DetMetrics(save_dir=self.save_dir, plot=False,
                            names=data["names"])
            tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
            confs = np.concatenate(stats["conf"])
            pcls = np.concatenate(stats["pred_cls"])
            tcls = np.concatenate(stats["target_cls"])
            if tp.shape[0] and tcls.shape[0]:
                dm.process(tp, confs, pcls, tcls)
            mr = dm.mean_results()
            results[f"metrics/mAP50({name})"] = mr[2]
            results[f"metrics/mAP50-95({name})"] = mr[3]
        LOGGER.info(f"pose val: {n_images} images "
                    + " ".join(f"{k}={v:.3f}" for k, v in results.items()))
        return results
