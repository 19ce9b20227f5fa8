"""Segmentation task triple: trainer + validator over the Segment head.

Counterpart of the reference's models/yolo/segment/ task (SegmentationTrainer/
Validator). Training is one jitted step (forward -> detection+mask loss ->
SGD -> EMA); validation computes BOTH box mAP and mask mAP (mask IoU at 10
thresholds on proto-resolution masks, mirroring detect/val matching).
"""

from __future__ import annotations

import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg, model_yaml_load, DEFAULT_CFG_DICT
from ..data.segment import SegmentDataset, collate_segment
from ..losses.segment import segmentation_loss
from ..nn.graph import DetectionModel
from ..nn.heads import decode_detections
from ..ops.nms import non_max_suppression
from ..parallel import make_mesh, shard_batch, replicate
from ..utils import (LOGGER, DetMetrics, ema_init, ema_update, save_checkpoint,
                     match_predictions)
from .optim import init_opt_state, opt_update, label_params


class SegmentationTrainer:
    def __init__(self, overrides=None):
        self.args = get_cfg(DEFAULT_CFG_DICT, overrides or {})
        self.save_dir = Path(self.args.project or "runs/segment") / \
            (self.args.name or "train")
        self.wdir = self.save_dir / "weights"

    def train(self):
        a = self.args
        from ..data import check_det_dataset
        data = check_det_dataset(a.data)
        ds = SegmentDataset(data["train"], imgsz=a.imgsz, nc=data["nc"])
        model = DetectionModel(model_yaml_load(a.model or "yolov8-seg.yaml"),
                               nc=data["nc"])
        assert model.task == "segment", "model yaml lacks a Segment head"
        self.model = model
        variables = model.init(jax.random.PRNGKey(a.seed), imgsz=a.imgsz)
        params, batch_stats = variables["params"], variables["batch_stats"]
        labels = label_params(params)
        opt_state = init_opt_state(params)
        ema = ema_init(params)
        emu = jnp.zeros((), jnp.int32)
        mesh = make_mesh(devices=jax.devices()[:1]) if a.batch % len(jax.devices()) \
            else make_mesh()
        hyp = {"box": a.box, "cls": a.cls, "dfl": a.dfl}

        def loss_fn(p, bs, batch):
            img = batch["img"].astype(jnp.float32) / 255.0
            (det, coefs, protos), ns = model.apply_train(
                {"params": p, "batch_stats": bs}, img)
            total, items = segmentation_loss(
                det, coefs, protos, batch, nc=model.nc, strides=model.strides,
                hyp=hyp, max_fg=min(a.max_boxes * 4, 128),
                overlap=bool(a.overlap_mask))
            return total, (items, ns)

        def step(p, bs, os_, ema, emu, batch, lr):
            (t, (items, ns)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bs, batch)
            p, os_ = opt_update(p, g, os_, labels, kind="sgd", lr_bias=lr, lr=lr,
                                momentum=jnp.float32(a.momentum),
                                weight_decay=a.weight_decay, accumulate=1)
            ema, emu = ema_update(ema, p, emu)
            return p, ns, os_, ema, emu, t, items

        jstep = jax.jit(step, donate_argnums=(0, 1, 2, 3, 4))
        params = replicate(mesh, params)
        batch_stats = replicate(mesh, batch_stats)
        opt_state = replicate(mesh, opt_state)
        ema = replicate(mesh, ema)

        n = len(ds)
        self.wdir.mkdir(parents=True, exist_ok=True)
        metrics = {}
        for epoch in range(a.epochs):
            order = list(range(n))
            random.Random(a.seed + epoch).shuffle(order)
            rng = random.Random(a.seed * 13 + epoch)
            losses = []
            for bi in range(max(n // a.batch, 1)):
                idxs = order[bi * a.batch:(bi + 1) * a.batch] or order[:a.batch]
                items = [ds.load(i, fliplr_p=a.fliplr, train=True, rng=rng)
                         for i in idxs]
                batch = collate_segment(items, max_boxes=a.max_boxes,
                                        mask_ratio=a.mask_ratio)
                batch = shard_batch(mesh, batch)
                lr = jnp.float32(a.lr0 * max(1 - epoch / max(a.epochs, 1), 0.01))
                out = jstep(params, batch_stats, opt_state, ema, emu, batch, lr)
                params, batch_stats, opt_state, ema, emu = out[:5]
                losses.append(out[5])
            mean_loss = float(jnp.mean(jnp.stack(losses)))
            LOGGER.info(f"epoch {epoch + 1}/{a.epochs} loss {mean_loss:.4f}")
        save_checkpoint(self.wdir / "last.npz",
                        params=jax.tree_util.tree_map(np.asarray, params),
                        batch_stats=jax.tree_util.tree_map(np.asarray, batch_stats),
                        ema_params=jax.tree_util.tree_map(np.asarray, ema),
                        train_args=dict(vars(a)), model_yaml=model.yaml)
        if a.val:
            validator = SegmentationValidator(args=a, save_dir=self.save_dir,
                                              data=data)
            metrics = validator(model=model, params=ema, batch_stats=batch_stats)
        self.metrics = metrics
        return metrics


class SegmentationValidator:
    """Box mAP + mask mAP (mask IoU at 10 thresholds in proto space)."""

    def __init__(self, args=None, save_dir=None, data=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        self.save_dir = Path(save_dir or "runs/segment/val")
        self.data = data

    def __call__(self, model=None, params=None, batch_stats=None):
        a = self.args
        from ..data import check_det_dataset
        data = self.data or check_det_dataset(a.data)
        ds = SegmentDataset(data[a.split], imgsz=a.imgsz, nc=data["nc"])
        conf = float(a.conf if a.conf is not None else 0.001)

        @jax.jit
        def val_step(params, batch_stats, img):
            x = img.astype(jnp.float32) / 255.0
            det, coefs, protos = model.module.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False)
            boxes, scores = decode_detections(det, model.nc, model.strides,
                                              model.reg_max)
            dets, counts = non_max_suppression(
                boxes, scores, conf_thres=conf, iou_thres=float(a.iou),
                max_det=int(a.max_det), max_nms=int(a.max_nms), multi_label=True)
            nm = protos.shape[-1]
            coef_flat = jnp.concatenate(
                [m.reshape(m.shape[0], -1, nm) for m in coefs], axis=1)
            return dets, counts, coef_flat, protos

        box_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        mask_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_images = 0
        bs = max(int(a.batch), 1)
        for start in range(0, len(ds), bs):
            idxs = list(range(start, min(start + bs, len(ds))))
            items = [ds.load(i) for i in idxs]
            while len(items) < bs:
                items.append(items[0])
            batch = collate_segment(items, max_boxes=a.max_boxes,
                                    mask_ratio=a.mask_ratio)
            dets, counts, coef_flat, protos = jax.tree_util.tree_map(
                np.asarray, val_step(params, batch_stats,
                                     jnp.asarray(batch["img"])))
            s = batch["img"].shape[1]
            mh, mw = protos.shape[1], protos.shape[2]
            for i in range(len(idxs)):
                n_images += 1
                k = int(counts[i])
                det = dets[i, :k]
                m = batch["mask_gt"][i] > 0
                gt_xywh = batch["bboxes"][i][m] * s
                gt_cls = batch["cls"][i][m]
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
                # mask TP: nearest-anchor coefficient lookup is not stored by the
                # NMS output; recompute pred masks from the best-matching anchor
                # per detection via box centers (approximation documented)
                tp_mask = self._mask_tp(det, coef_flat[i], protos[i],
                                        batch["masks"][i], gt_cls, s, mh, mw,
                                        model)
                mask_stats["tp"].append(tp_mask)
                mask_stats["conf"].append(det[:, 4])
                mask_stats["pred_cls"].append(det[:, 5])
                mask_stats["target_cls"].append(gt_cls)

        results = {}
        for name, stats in (("box", box_stats), ("mask", mask_stats)):
            if not stats["tp"]:
                continue
            dm = DetMetrics(save_dir=self.save_dir, plot=False,
                            names=data["names"])
            tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
            confs = np.concatenate(stats["conf"])
            pcls = np.concatenate(stats["pred_cls"])
            tcls = np.concatenate(stats["target_cls"])
            if tp.shape[0] and tcls.shape[0]:
                dm.process(tp, confs, pcls, tcls)
            mr = dm.mean_results()
            results[f"metrics/mAP50({name[0].upper()})"] = mr[2]
            results[f"metrics/mAP50-95({name[0].upper()})"] = mr[3]
        LOGGER.info(f"segment val: {n_images} images "
                    + " ".join(f"{k}={v:.3f}" for k, v in results.items()))
        return results

    def _mask_tp(self, det, coefs, proto, gt_masks_overlap, gt_cls, s, mh, mw,
                 model, iouv=np.linspace(0.5, 0.95, 10)):
        """Mask-IoU TP matrix for one image's detections."""
        from ..ops.anchors import make_anchors
        n = len(det)
        correct = np.zeros((n, len(iouv)), bool)
        n_gt = len(gt_cls)
        if n == 0 or n_gt == 0:
            return correct
        # map each detection to the nearest anchor by center (the NMS output
        # does not carry anchor indices; centers coincide for the argmax anchor)
        feat_shapes = [(s // st, s // st) for st in model.strides]
        anchors, stride_t = make_anchors(feat_shapes, model.strides, 0.5)
        anc = np.asarray(anchors) * np.asarray(stride_t)
        cx = (det[:, 0] + det[:, 2]) / 2
        cy = (det[:, 1] + det[:, 3]) / 2
        d2 = (anc[None, :, 0] - cx[:, None]) ** 2 + (anc[None, :, 1] - cy[:, None]) ** 2
        a_idx = d2.argmin(1)
        pm = 1 / (1 + np.exp(-(coefs[a_idx] @ proto.reshape(-1, proto.shape[-1]).T)))
        pm = pm.reshape(n, mh, mw) > 0.5
        # crop to det box in mask space
        ys, xs = np.mgrid[0:mh, 0:mw]
        scale = mh / s
        for j in range(n):
            x1, y1, x2, y2 = det[j, :4] * scale
            pm[j] &= (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
        gt = np.stack([(gt_masks_overlap == (g + 1)) for g in range(n_gt)])
        inter = (pm[:, None] & gt[None]).sum((2, 3)).astype(np.float64)
        union = (pm[:, None] | gt[None]).sum((2, 3)).astype(np.float64) + 1e-9
        iou = inter / union
        iou *= (gt_cls[None, :] == det[:, 5][:, None])
        for t_i, t in enumerate(iouv):
            matches = np.array(np.nonzero(iou >= t)).T
            if matches.shape[0]:
                order = iou[matches[:, 0], matches[:, 1]].argsort()[::-1]
                matches = matches[order]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
                correct[matches[:, 0].astype(int), t_i] = True
        return correct
