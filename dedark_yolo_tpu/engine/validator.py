"""DetectionValidator: fp32 validation with device-side NMS and host-side mAP.

Counterpart of the reference BaseValidator/DetectionValidator
(ultralytics/engine/validator.py:93-207, models/yolo/detect/val.py). Key parity
points:
  - training-val always runs float32 on the EMA params (validator.py:102-111
    forces half=False);
  - NMS with multi_label=True and conf from args (detect/val.py:62-70; conf
    defaults to 0.001 standalone like cfg __init__);
  - per-image TP matrix at 10 IoU thresholds vs labels (detect/val.py:72-116);
  - DetMetrics + ConfusionMatrix + per-image speed phases mirroring
    validator.py:160-199's Profile timers.

TPU design: one jitted forward+decode+NMS graph of fixed shapes; matching happens
in numpy on the small per-image detection sets, in NATIVE image space like the
reference: predictions are letterbox-inverted with scale_boxes (detect/val.py:84-116)
and ground truth comes from the original normalized labels scaled by the true
original shape, so mAP and the COCO json coordinates match the reference's
measurement definition exactly (detect/val.py:221-258).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg, DEFAULT_CFG_DICT
from ..data import YOLODataset, DataLoader, ValTransforms, check_det_dataset
from ..losses import detection_loss
from ..ops.boxes import scale_boxes, xywh2xyxy, xyxy2xywh
from ..ops.nms import non_max_suppression
from ..utils import LOGGER, DetMetrics, ConfusionMatrix, match_predictions, increment_dir


def resolve_val_max_boxes(args, ds):
    """max_boxes=0 -> densest val image, rounded to the TPU sublane multiple.

    Val applies no compositing augs, so the ceiling is the max per-image
    label count. The val step is its own compiled program — independent of
    whatever the trainer resolved for the mosaic'd train step."""
    if int(args.max_boxes) > 0:
        return
    dens = max((len(lb) for lb in ds.labels), default=1)
    args.max_boxes = int(min(max(-(-max(dens, 1) // 8) * 8, 8), 1024))
    LOGGER.info(f"auto max_boxes (val): {args.max_boxes}")


class DetectionValidator:
    def __init__(self, args=None, save_dir=None, data=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        if self.args.conf is None:
            self.args.conf = 0.001  # val default (reference cfg: 0.001 for val)
        self.save_dir = (Path(save_dir) if save_dir else
                         increment_dir(Path("runs/detect/val"),
                                       getattr(self.args, "exist_ok", False)))
        self.data = data
        self.speed = {"preprocess": 0.0, "inference": 0.0, "loss": 0.0,
                      "postprocess": 0.0}

    def _make_val_step(self, model, with_loss, hyp):
        a = self.args
        conf = float(a.conf)
        iou = float(a.iou)
        max_det = int(a.max_det)
        max_nms = int(a.max_nms)

        from .autobackend import AutoBackend
        if isinstance(model, AutoBackend):
            # exported-artifact validation (reference standalone val wraps the
            # model in AutoBackend, validator.py:116-123): the artifact does
            # its own enhance+forward+decode at a FIXED batch shape (the last
            # val batch is padded up to it); only NMS runs here
            @jax.jit
            def nms_step(boxes, scores):
                return non_max_suppression(
                    boxes, scores, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, max_nms=max_nms, multi_label=True,
                    agnostic=bool(a.agnostic_nms))

            def backend_step(params, batch_stats, batch):
                img = np.asarray(batch["img"])
                n = img.shape[0]
                if n < model.batch:
                    img = np.concatenate(
                        [img, np.zeros((model.batch - n, *img.shape[1:]),
                                       img.dtype)])
                boxes, scores = model.forward(img)
                dets, counts = nms_step(boxes, scores)
                return {"dets": dets[:n], "counts": counts[:n]}

            return backend_step

        is_rtdetr = model.head["name"] == "RTDETRDecoder"

        def val_step(params, batch_stats, batch):
            img = batch["img"].astype(jnp.float32) / 255.0  # fp32 forced
            variables = {"params": params, "batch_stats": batch_stats}
            raw = model.module.apply(variables, img, train=False)
            if is_rtdetr:
                # NMS-free queries (reference RTDETRValidator postprocess):
                # confidence-filter only, ONE class per query (argmax) and NO
                # IoU suppression — running standard multi-label NMS here
                # would both duplicate per-class candidates and suppress
                # same-class queries, a metric-parity deviation (ADVICE r2 #4)
                h, w = img.shape[1], img.shape[2]
                scale = jnp.asarray([w, h, w, h], raw.dtype)
                from ..ops.boxes import xywh2xyxy
                xyxy = xywh2xyxy(raw[..., :4] * scale)       # (B, nq, 4)
                qscores = raw[..., 4:]                        # (B, nq, nc)
                qconf = jnp.max(qscores, axis=-1)
                qcls = jnp.argmax(qscores, axis=-1).astype(xyxy.dtype)
                k = min(max_det, qconf.shape[-1])
                top_conf, top_i = jax.lax.top_k(qconf, k)     # sorted desc
                sel = jnp.take_along_axis(xyxy, top_i[..., None], axis=1)
                sel_cls = jnp.take_along_axis(qcls, top_i, axis=1)
                dets = jnp.concatenate(
                    [sel, top_conf[..., None], sel_cls[..., None]], axis=-1)
                if k < max_det:
                    dets = jnp.pad(dets, ((0, 0), (0, max_det - k), (0, 0)))
                counts = (top_conf > conf).sum(axis=-1).astype(jnp.int32)
            else:
                from ..nn.heads import decode_detections
                boxes, scores = decode_detections(raw, model.nc, model.strides,
                                                  model.reg_max)
                if getattr(a, "save_hybrid", False):
                    # autolabelling (reference detect/val.py:38-39 +
                    # ops.py:221-227): GT boxes join the candidate set with
                    # confidence 1.0, so NMS output = labels + novel
                    # detections. Fixed-shape: the padded (B, max_boxes)
                    # label tensor concatenates directly; padding rows carry
                    # zero scores and fall to the conf gate. Conscious
                    # deviation: the reference appends the labels in
                    # NORMALIZED units against pixel predictions (upstream
                    # quirk) — here they are scaled into the letterbox frame
                    # so the hybrid actually merges.
                    h, w = img.shape[1], img.shape[2]
                    gt_boxes = batch["bboxes"] * jnp.asarray(
                        [w, h, w, h], boxes.dtype)
                    gt_scores = (jax.nn.one_hot(
                        batch["cls"].astype(jnp.int32), model.nc,
                        dtype=scores.dtype) * batch["mask_gt"][..., None])
                    boxes = jnp.concatenate(
                        [boxes, gt_boxes.astype(boxes.dtype)], axis=1)
                    scores = jnp.concatenate([scores, gt_scores], axis=1)
                dets, counts = non_max_suppression(
                    boxes, scores, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, max_nms=max_nms, multi_label=True,
                    agnostic=bool(a.agnostic_nms))
            out = {"dets": dets, "counts": counts}
            if with_loss:
                lbatch = {"cls": batch["cls"], "bboxes": batch["bboxes"],
                          "mask_gt": batch["mask_gt"]}
                if is_rtdetr:
                    # final-layer matching loss straight from the EVAL
                    # outputs (real val losses instead of fabricated zeros,
                    # ADVICE #3). A train=True forward would give the aux
                    # layers too but normalizes BatchNorm with CURRENT-batch
                    # statistics — a different function from the evaluated
                    # model. raw = (B, nq, 4+nc): normalized cxcywh + sigmoid
                    # scores; recover logits for the VFL term.
                    from ..losses.rtdetr import _layer_loss
                    p = jnp.clip(raw[..., 4:], 1e-7, 1.0 - 1e-7)
                    logits = jnp.log(p) - jnp.log1p(-p)
                    g, c_, l = _layer_loss(
                        raw[..., :4], logits, lbatch["bboxes"],
                        lbatch["cls"],
                        lbatch["mask_gt"].astype(raw.dtype), model.nc)
                    out["loss_items"] = jnp.stack([g, c_, l])
                else:
                    total, items = detection_loss(raw, lbatch, nc=model.nc,
                                                  strides=model.strides, hyp=hyp)
                    out["loss_items"] = jnp.stack(list(items))
            return out

        from ..utils import matmul_precision_wrap
        return matmul_precision_wrap(jax.jit(val_step),
                                     getattr(a, "matmul_precision", None))

    def __call__(self, model=None, params=None, batch_stats=None, mesh=None,
                 with_loss=False):
        a = self.args
        from ..utils.checks import check_imgsz
        a.imgsz = check_imgsz(a.imgsz, stride=32)
        data = self.data or check_det_dataset(a.data)
        names = data["names"]
        nc = data["nc"]
        ds = YOLODataset(data[a.split], imgsz=a.imgsz, nc=nc,
                         single_cls=a.single_cls)
        resolve_val_max_boxes(a, ds)
        if a.rect:
            # rect val: quantized aspect buckets, one static shape per bucket
            # (reference base.py:211-234 sorts by aspect; here each bucket gets
            # its own jit specialization of the same val step)
            import math as _math
            buckets = {}
            for i, (h, w) in enumerate(ds.image_shapes()):
                ar = h / max(w, 1)
                if ar >= 1:
                    th, tw = a.imgsz, max(_math.ceil(a.imgsz / ar / 32) * 32, 32)
                else:
                    th, tw = max(_math.ceil(a.imgsz * ar / 32) * 32, 32), a.imgsz
                buckets.setdefault((th, tw), []).append(i)
            loaders = [DataLoader(ds, ValTransforms(imgsz=shape), a.batch,
                                  max_boxes=a.max_boxes, shuffle=False,
                                  workers=a.workers, drop_last=False,
                                  indices=idxs)
                       for shape, idxs in sorted(buckets.items())]
        else:
            loaders = [DataLoader(ds, ValTransforms(imgsz=a.imgsz), a.batch,
                                  max_boxes=a.max_boxes, shuffle=False,
                                  workers=a.workers, drop_last=False)]
        hyp = {"box": a.box, "cls": a.cls, "dfl": a.dfl, "lrl": a.lrl}
        cache_key = bool(with_loss)
        if not hasattr(self, "_val_step_cache"):
            self._val_step_cache = {}
        if cache_key not in self._val_step_cache:
            self._val_step_cache[cache_key] = self._make_val_step(model, with_loss, hyp)
        val_step = self._val_step_cache[cache_key]

        metrics = DetMetrics(save_dir=self.save_dir, plot=a.plots, names=names)
        cm = ConfusionMatrix(nc=nc)
        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        loss_accum = np.zeros(3)
        n_batches = 0
        n_images = 0
        t_inf = t_post = 0.0

        # multi-device val: params replicated once, each batch sharded over the
        # mesh's data axis — XLA runs the forward+NMS SPMD and the host gathers
        # the small fixed-shape outputs (replaces the reference's rank-0-only
        # val, validator.py:102-111, with true in-val data parallelism)
        n_dev = int(mesh.devices.size) if mesh is not None else 1
        if n_dev > 1:
            from ..parallel import replicate, shard_batch
            params = replicate(mesh, params)
            batch_stats = replicate(mesh, batch_stats)

        jdict = []  # COCO-style detections when save_json (reference detect/val.py:221-258)
        txt_written = set()  # stems written THIS pass: first write truncates
        # any stale file from a previous epoch's val over the same save_dir
        orig_shapes = ds.image_shapes()   # true original (h, w) per dataset index

        def gen_batches():
            for dl in loaders:
                order = dl._indices()  # shuffle=False: batches chunk this order
                cursor = 0
                for batch in dl:
                    bsz = batch["img"].shape[0]
                    ds_idxs = order[cursor:cursor + bsz]
                    cursor += bsz
                    yield batch, ds_idxs

        def process(out, batch, ds_idxs):
            nonlocal loss_accum, n_batches, n_images, t_inf, t_post
            bsz = batch["img"].shape[0]
            t0 = time.perf_counter()
            dets = np.asarray(out["dets"])   # blocks until the batch finishes
            counts = np.asarray(out["counts"])
            t_inf += time.perf_counter() - t0
            if with_loss:
                loss_accum += np.asarray(out["loss_items"])
            n_batches += 1

            t1 = time.perf_counter()
            bh, bw = batch["img"].shape[1], batch["img"].shape[2]
            for i in range(bsz):
                n_images += 1
                idx = ds_idxs[i]
                h0, w0 = (int(orig_shapes[idx][0]), int(orig_shapes[idx][1]))
                k = int(counts[i])
                det = dets[i, :k].copy()   # (k, 6) xyxy conf cls (letterbox)
                if k:
                    # letterbox-inverse to original image space
                    # (reference detect/val.py:84-116 / ops.py:95-125)
                    det[:, :4] = np.asarray(scale_boxes(
                        (bh, bw), jnp.asarray(det[:, :4]), (h0, w0)))
                # ground truth in native space from the original labels
                lb = ds.labels[idx]
                gt_cls = lb[:, 0].copy().astype(np.float32)
                if a.single_cls:
                    gt_cls[:] = 0
                if len(lb):
                    gt_xywh = lb[:, 1:5] * np.asarray([w0, h0, w0, h0],
                                                      np.float32)
                    gt_xyxy = np.asarray(xywh2xyxy(jnp.asarray(gt_xywh)))
                else:
                    gt_xyxy = np.zeros((0, 4), np.float32)
                tp = match_predictions(det[:, :4], det[:, 5], gt_xyxy, gt_cls)
                stats["tp"].append(tp)
                stats["conf"].append(det[:, 4])
                stats["pred_cls"].append(det[:, 5])
                stats["target_cls"].append(gt_cls)
                if a.plots:
                    cm.process_batch(det, gt_xyxy, gt_cls)
                if getattr(a, "save_txt", False) and len(det):
                    # normalized-xywh label lines (reference detect/val.py:
                    # 212-219 save_one_txt — which writes NO file for images
                    # with zero detections); with save_hybrid these are the
                    # autolabelling output (GT + novel detections)
                    txt_dir = self.save_dir / "labels"
                    txt_dir.mkdir(parents=True, exist_ok=True)
                    gn = np.asarray([w0, h0, w0, h0], np.float32)
                    stem = Path(ds.im_files[idx]).stem
                    mode = "a" if stem in txt_written else "w"
                    txt_written.add(stem)
                    xywh = np.asarray(xyxy2xywh(jnp.asarray(det[:, :4]))) / gn
                    with open(txt_dir / f"{stem}.txt", mode) as f:
                        for d, (cx, cy, bw_, bh_) in zip(det, xywh):
                            vals = [int(d[5]), cx, cy, bw_, bh_]
                            if a.save_conf:
                                vals.append(d[4])
                            f.write(" ".join(f"{v:g}" for v in vals) + "\n")
                if a.save_json:
                    # native-space xywh + filename-derived id
                    # (reference detect/val.py:221-236 pred_to_json)
                    stem = Path(ds.im_files[idx]).stem
                    image_id = int(stem) if stem.isnumeric() else stem
                    for d in det:
                        jdict.append({
                            "image_id": image_id,
                            "category_id": int(d[5]),
                            "bbox": [round(float(d[0]), 3),
                                     round(float(d[1]), 3),
                                     round(float(d[2] - d[0]), 3),
                                     round(float(d[3] - d[1]), 3)],
                            "score": round(float(d[4]), 5)})
            t_post += time.perf_counter() - t1

        # depth-2 pipeline: dispatch batch i+1 before reading back batch i —
        # the next batch's host->device upload and XLA execution overlap this
        # batch's readback + host-side matching (utils/pipeline.py)
        def dispatch(item):
            nonlocal t_inf
            batch, ds_idxs = item
            t0 = time.perf_counter()
            bsz = batch["img"].shape[0]
            dev_batch = (shard_batch(mesh, batch)
                         if n_dev > 1 and bsz % n_dev == 0 else batch)
            out = val_step(params, batch_stats, dev_batch)  # async dispatch
            t_inf += time.perf_counter() - t0
            return out, batch, ds_idxs

        from ..utils.pipeline import pipelined
        pipelined(gen_batches(), dispatch, lambda rec: process(*rec))

        if n_images == 0:
            return {}
        tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
        conf = np.concatenate(stats["conf"])
        pred_cls = np.concatenate(stats["pred_cls"])
        target_cls = np.concatenate(stats["target_cls"])
        if tp.shape[0] and target_cls.shape[0]:
            metrics.process(tp, conf, pred_cls, target_cls)
        self.speed = {"preprocess": 0.0,
                      "inference": t_inf / n_images * 1000,
                      "loss": 0.0,
                      "postprocess": t_post / n_images * 1000}
        metrics.speed = self.speed

        results = metrics.results_dict
        if with_loss and n_batches:
            items = loss_accum / n_batches
            results.update({"val/box_loss": items[0], "val/cls_loss": items[1],
                            "val/dfl_loss": items[2]})
        if a.save_json and jdict:
            import json
            self.save_dir.mkdir(parents=True, exist_ok=True)
            jpath = self.save_dir / "predictions.json"
            jpath.write_text(json.dumps(jdict))
            LOGGER.info(f"saved {len(jdict)} detections to {jpath}")

        # per-class table (reference validator print_results)
        mr = metrics.mean_results()
        LOGGER.info(f"val: {n_images} images  P {mr[0]:.3f}  R {mr[1]:.3f}  "
                    f"mAP50 {mr[2]:.3f}  mAP50-95 {mr[3]:.3f}  "
                    f"({self.speed['inference']:.1f}ms/img inference)")
        if a.verbose and len(metrics.ap_class_index):
            for i, c in enumerate(metrics.ap_class_index):
                p, r, ap50, ap = metrics.class_result(i)
                LOGGER.info(f"  {names.get(int(c), c):>16}  P {p:.3f}  R {r:.3f}  "
                            f"mAP50 {ap50:.3f}  mAP50-95 {ap:.3f}")
        if a.plots:
            from ..utils.plotting import plot_confusion_matrix
            try:
                plot_confusion_matrix(cm.matrix, names,
                                      self.save_dir / "confusion_matrix.png")
            except Exception:
                pass
        self.confusion_matrix = cm
        self.metrics = metrics
        return results
