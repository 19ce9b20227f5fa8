"""DetectionPredictor: batched streaming inference through ONE compiled graph.

Counterpart of the reference BasePredictor/DetectionPredictor
(ultralytics/engine/predictor.py:118-330, models/yolo/detect/predict.py). The
reference letterboxes on the host, forwards, then NMS-loops per image; here
letterbox happens on the host (cv2, cheap) but enhance+backbone+decode+NMS is a
single fixed-shape jitted function, so batches stream through one XLA program.
Boxes are scaled back to original image space with the reference's
letterbox-inverse (ops.py:95-125).

Optionally returns the lowlight_recovery-enhanced image (save_enhanced) without a
separate forward: the enhancement layer output is captured in the same graph via
flax's intermediate capture.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg, DEFAULT_CFG_DICT
from ..data.augment import letterbox
from ..data.dataset import IMG_FORMATS
from ..ops.boxes import scale_boxes
from ..utils import LOGGER, increment_dir
from ..ops.nms import non_max_suppression
from .results import Results


VID_FORMATS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v", ".mpg", ".mpeg"}


def load_source(source, vid_stride=1):
    """Yield (path, BGR image, meta) for any inference source: file / dir /
    list / ndarray / video (counterpart of ultralytics/data/loaders.py
    LoadImages), plus webcam index / RTSP-RTMP-HTTP URL / .streams list file
    (LoadStreams, loaders.py:31-117), "screen" capture (LoadScreenshots,
    :119-160), and in-memory PIL images / CHW tensors (LoadPilAndNumpy /
    LoadTensor, :270-311).

    meta is None for still images; for video/stream frames it is
    (frame_idx, fps, total_frames) so the caller can mux output video
    (total_frames=0 when unbounded)."""
    import cv2
    from ..data.loaders import (LoadScreenshots, LoadStreams,
                                is_stream_source, pil_to_bgr,
                                tensor_to_bgr_list)
    if isinstance(source, np.ndarray):
        yield "array", source, None
        return
    # PIL image (reference LoadPilAndNumpy)
    if type(source).__module__.startswith("PIL") and hasattr(source, "mode"):
        yield "pil", pil_to_bgr(source), None
        return
    # torch / jax CHW-RGB tensor (reference LoadTensor)
    if (hasattr(source, "__array__") and hasattr(source, "ndim")
            and getattr(source, "ndim", 0) in (3, 4)
            and not isinstance(source, np.ndarray)):
        for i, img in enumerate(tensor_to_bgr_list(source)):
            yield f"tensor{i}", img, None
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from load_source(s, vid_stride)
        return
    # live streams: webcam index / URL / .streams file
    if is_stream_source(source):
        streams = LoadStreams(source, vid_stride=vid_stride)
        try:
            for paths, frames, metas in streams:
                for pth, f, m in zip(paths, frames, metas):
                    yield pth, f, m
        finally:
            streams.close()
        return
    if isinstance(source, str) and source.strip().lower().startswith("screen"):
        yield from ((p, f, m) for paths, frames, metas
                    in LoadScreenshots(source)
                    for p, f, m in zip(paths, frames, metas))
        return
    p = Path(source)
    if p.is_dir():
        for f in sorted(p.rglob("*")):
            if f.suffix.lower() in IMG_FORMATS or f.suffix.lower() in VID_FORMATS:
                yield from load_source(f, vid_stride)
    elif p.is_file() and p.suffix.lower() in VID_FORMATS:
        cap = cv2.VideoCapture(str(p))
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % vid_stride == 0:
                yield str(p), frame, (idx, fps, total)
            idx += 1
        cap.release()
    elif p.is_file():
        from ..utils.patches import imread
        img = imread(p)
        if img is None:
            raise FileNotFoundError(f"could not read image: {p}")
        yield str(p), img, None
    else:
        raise FileNotFoundError(f"source not found: {source}")


class DetectionPredictor:
    def __init__(self, args=None, model=None, params=None, batch_stats=None,
                 names=None, save_dir=None, members=None):
        self.args = args if args is not None else get_cfg(DEFAULT_CFG_DICT, {})
        if self.args.conf is None:
            self.args.conf = 0.25  # predict default (reference model.py:213)
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        # ensemble: list of (params, batch_stats) trees for the same graph;
        # every member forwards and candidates concat before NMS (reference
        # Ensemble.forward, tasks.py:534-546 torch.cat(outputs, 1))
        self.members = members or [(params, batch_stats)]
        self.names = names or (model.names if model else {})
        self.save_dir = (Path(save_dir) if save_dir else
                         increment_dir(Path("runs/detect/predict"),
                                       getattr(self.args, "exist_ok", False)))
        self._step = None
        self.speed = {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0}

    def _make_step(self):
        a = self.args
        model = self.model
        conf, iou = float(a.conf), float(a.iou)
        max_det, max_nms = int(a.max_det), int(a.max_nms)
        want_enhanced = bool(a.save_enhanced)
        dtype = jnp.bfloat16 if a.half else jnp.float32

        from .autobackend import AutoBackend
        if isinstance(model, AutoBackend):
            if getattr(a, "augment", False):
                # reference parity: AutoBackend forwards `augment` only for
                # the live-torch branch; exported artifacts ignore it
                LOGGER.warning(
                    "augment=True is ignored for exported artifacts "
                    "(single-scale inference)")
            # exported-artifact inference (reference predictor wraps the model
            # in AutoBackend, predictor.py:332-344): the artifact runs
            # enhance+forward+decode; only NMS happens here
            @jax.jit
            def nms_step(boxes, scores):
                dets, counts = non_max_suppression(
                    boxes, scores, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, max_nms=max_nms, multi_label=False,
                    agnostic=bool(a.agnostic_nms))
                return {"dets": dets, "counts": counts}

            return lambda members, img_u8: nms_step(*model.forward(img_u8))

        # test-time augmentation (reference tasks.py:303-343): detect-task
        # live models only — seg/pose/rtdetr fall back to single scale with
        # a warning exactly like the reference (tasks.py:358-364, 381-387)
        use_tta = bool(getattr(a, "augment", False))
        if use_tta and (model.task != "detect"
                        or model.head["name"] == "RTDETRDecoder"):
            LOGGER.warning(
                f"{model.task} has not supported augment inference yet — "
                "using single-scale inference instead")
            use_tta = False
        if use_tta and (want_enhanced or getattr(a, "visualize", False)):
            LOGGER.warning("augment=True skips save_enhanced/visualize "
                           "captures (reference _predict_augment behavior)")

        # per-stage feature dumps (reference predictor.py:136-162
        # feature_visualization): capture every layer's activation, first
        # image only, sliced to 32 channels on DEVICE so readback stays tiny
        viz_capture = (tuple(sp.i for sp in model.specs)
                       if getattr(a, "visualize", False) and not use_tta
                       else ())

        if use_tta:
            def tta_step(members, img_u8):
                img = img_u8.astype(dtype) / 255.0
                boxes_l, scores_l = [], []
                for params, batch_stats in members:
                    b, s = model.tta_eval(
                        {"params": params, "batch_stats": batch_stats}, img)
                    boxes_l.append(b)
                    scores_l.append(s)
                dets, counts = non_max_suppression(
                    jnp.concatenate(boxes_l, 1).astype(jnp.float32),
                    jnp.concatenate(scores_l, 1).astype(jnp.float32),
                    conf_thres=conf, iou_thres=iou, max_det=max_det,
                    max_nms=max_nms, multi_label=False,
                    agnostic=bool(a.agnostic_nms))
                return {"dets": dets, "counts": counts}

            from ..utils import matmul_precision_wrap
            return matmul_precision_wrap(jax.jit(tta_step),
                                         getattr(a, "matmul_precision", None))

        def step(members, img_u8):
            img = img_u8.astype(dtype) / 255.0
            from ..nn.heads import decode_detections
            enhanced = None
            caps = {}
            boxes_l, scores_l = [], []
            # members is a tuple of (params, batch_stats) pairs — a static
            # Python loop unrolled at trace time (one member in the common case)
            for mi, (params, batch_stats) in enumerate(members):
                variables = {"params": params, "batch_stats": batch_stats}
                if want_enhanced and mi == 0:
                    raw, state = model.module.apply(
                        variables, img, train=False, mutable=["intermediates"],
                        capture_intermediates=lambda mdl, name:
                        "LowlightRecovery" in type(mdl).__name__,
                        capture=viz_capture)
                    if viz_capture:
                        raw, caps = raw
                    inter = state["intermediates"]
                    enhanced = jax.tree_util.tree_leaves(inter)[0]
                elif viz_capture and mi == 0:
                    raw, caps = model.module.apply(variables, img, train=False,
                                                   capture=viz_capture)
                else:
                    raw = model.module.apply(variables, img, train=False)
                if model.head["name"] == "RTDETRDecoder":
                    # NMS-free queries (B, nq, 4+nc): normalized cxcywh to
                    # pixels; scores already sigmoid
                    h, w = img.shape[1], img.shape[2]
                    scale = jnp.asarray([w, h, w, h], raw.dtype)
                    b, s = raw[..., :4] * scale, raw[..., 4:]
                else:
                    b, s = decode_detections(raw, model.nc, model.strides,
                                             model.reg_max)
                boxes_l.append(b)
                scores_l.append(s)
            # candidate-level merge across members (reference Ensemble cat dim 1)
            boxes = jnp.concatenate(boxes_l, axis=1)
            scores = jnp.concatenate(scores_l, axis=1)
            dets, counts = non_max_suppression(
                boxes.astype(jnp.float32), scores.astype(jnp.float32),
                conf_thres=conf, iou_thres=iou, max_det=max_det, max_nms=max_nms,
                multi_label=False, agnostic=bool(a.agnostic_nms))
            out = {"dets": dets, "counts": counts}
            if enhanced is not None:
                out["enhanced"] = jnp.clip(enhanced.astype(jnp.float32), 0, 1)
            if caps:
                out["features"] = {str(k): v.astype(jnp.float32)
                                   for k, v in caps.items()}
            return out

        from ..utils import matmul_precision_wrap
        return matmul_precision_wrap(jax.jit(step),
                                     getattr(a, "matmul_precision", None))

    def extra_fields(self, out, i, k, orig_shape, imgsz):
        """Task hook: per-image extra Results kwargs (masks/keypoints)."""
        return {}

    def __call__(self, source, stream=False):
        gen = self.stream_inference(source)
        return gen if stream else list(gen)

    def stream_inference(self, source):
        a = self.args
        from ..utils.checks import check_imgsz, check_imshow
        a.imgsz = check_imgsz(a.imgsz, stride=32)
        if a.show:
            # disable (with a warning) on headless hosts rather than crash
            # mid-stream (reference predictor.py:94-95)
            a.show = check_imshow(warn=True)
        if self._step is None:
            self._step = self._make_step()
        imgsz = a.imgsz if isinstance(a.imgsz, int) else a.imgsz[0]
        batch_size = max(1, int(a.batch))
        buf_paths, buf_imgs, buf_orig, buf_meta = [], [], [], []
        self._writers = {}

        from .. import native as _native
        use_native = _native.available()

        def dispatch():
            """Letterbox + submit the buffered batch; returns a pending record
            (results are read back later, in demux)."""
            nonlocal buf_paths, buf_imgs, buf_orig, buf_meta
            if not buf_imgs:
                return None
            n = len(buf_imgs)
            t0 = time.perf_counter()
            if use_native:
                # batched GIL-free letterbox (C++ thread pool); buf_imgs holds
                # raw BGR originals in this mode
                srcs = buf_imgs + [buf_imgs[0]] * (batch_size - n)
                arr = _native.letterbox_batch(srcs, imgsz, fill=114, swap_rb=True)
            else:
                while len(buf_imgs) < batch_size:
                    buf_imgs.append(np.zeros_like(buf_imgs[0]))
                arr = np.stack(buf_imgs)
            # `device:`/YOLO.to() pins execution (uncommitted inputs follow
            # the default device; e.g. device='cpu' runs predict off-chip)
            import contextlib
            dev_ctx = (jax.default_device(jax.devices(a.device)[0])
                       if getattr(a, "device", None) else
                       contextlib.nullcontext())
            with dev_ctx:
                out = self._step(tuple(self.members), jnp.asarray(arr))
            # letterbox+upload+dispatch time; the readback block is added in
            # demux — NOT wall time between the two, which under pipelining
            # would count the next batch's host work as inference
            t_disp = time.perf_counter() - t0
            rec = (out, n, t_disp, buf_paths, buf_orig, buf_meta)
            buf_paths, buf_imgs, buf_orig, buf_meta = [], [], [], []
            return rec

        def demux(rec):
            out, n, t_disp, paths, origs, metas = rec
            t1 = time.perf_counter()
            dets = np.asarray(out["dets"])   # blocks until the batch finishes
            counts = np.asarray(out["counts"])
            enhanced = (np.asarray(out["enhanced"]) if "enhanced" in out else None)
            t_inf = (t_disp + time.perf_counter() - t1) / n * 1000

            if "features" in out and paths:
                # per-stage grids for the FIRST image of the batch
                from ..utils.plotting import feature_visualization
                from pathlib import Path as _P
                feature_visualization(
                    {int(k): np.asarray(v) for k, v in out["features"].items()},
                    self.save_dir / "features" / _P(paths[0]).stem)
            for i in range(n):
                k = int(counts[i])
                det = dets[i, :k].copy()
                orig = origs[i]
                if k:
                    det[:, :4] = np.asarray(scale_boxes(
                        (imgsz, imgsz), jnp.asarray(det[:, :4]), orig.shape[:2]))
                res = Results(
                    orig_img=np.ascontiguousarray(orig[..., ::-1]),
                    path=paths[i], names=self.names, boxes=det,
                    speed={"inference": t_inf},
                    enhanced_img=(enhanced[i] if enhanced is not None else None),
                    **self.extra_fields(out, i, k, orig.shape[:2], imgsz))
                # video-frame metadata (frame_idx, fps, total) for consumers
                # that save after this stream (track mode muxes its own mp4)
                res.source_meta = metas[i]
                if a.save or a.save_txt or a.save_crop or a.save_enhanced \
                        or a.show:
                    self._write(res, metas[i])
                yield res

        # depth-2 pipeline: batch i+1's decode/letterbox/upload overlap batch
        # i's device execution; results still stream in source order
        pending = None
        for path, img, meta in load_source(source, vid_stride=int(a.vid_stride)):
            if use_native:
                buf_imgs.append(img)  # letterboxed in C++ at dispatch time
            else:
                lb, _, _ = letterbox(img, imgsz)
                buf_imgs.append(np.ascontiguousarray(lb[..., ::-1]))  # RGB
            buf_paths.append(path)
            buf_orig.append(img)
            buf_meta.append(meta)
            if len(buf_imgs) == batch_size:
                newly = dispatch()
                if pending is not None:
                    yield from demux(pending)
                pending = newly
        newly = dispatch()
        if pending is not None:
            yield from demux(pending)
        if newly is not None:
            yield from demux(newly)
        for w in self._writers.values():
            w.release()
        self._writers = {}

    def _write(self, res, meta=None):
        import cv2
        stem = Path(res.path).stem if res.path != "array" else "image"
        self.save_dir.mkdir(parents=True, exist_ok=True)
        a = self.args
        # reference predictor.py:199-203: plot args from cfg keys
        plot_args = {"line_width": a.line_width,
                     "boxes": getattr(a, "boxes", True),
                     "conf": getattr(a, "show_conf", True),
                     "labels": getattr(a, "show_labels", True)}
        if a.show:
            # display window (reference predictor.py:346-354 show); the flag
            # was already gated by check_imshow at stream start
            import cv2 as _cv2
            _cv2.imshow(str(res.path), res.plot(**plot_args)[..., ::-1])
            _cv2.waitKey(1 if meta is not None else 500)
        if meta is not None and self.args.save:
            # video frame: mux annotated frames (predictor.py:356-377 equivalent)
            _, fps, _ = meta
            if res.path not in self._writers:
                h, w = res.orig_shape
                out_path = str(self.save_dir / f"{stem}_pred.mp4")
                self._writers[res.path] = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                    max(fps / max(int(self.args.vid_stride), 1), 1), (w, h))
            self._writers[res.path].write(res.plot(**plot_args)[..., ::-1])
            return
        if self.args.save:
            res.save(self.save_dir / f"{stem}.jpg", **plot_args)
        if self.args.save_txt:
            res.save_txt(self.save_dir / "labels" / f"{stem}.txt",
                         save_conf=self.args.save_conf)
        if self.args.save_crop:
            res.save_crop(self.save_dir / "crops", file_name=stem)
        if self.args.save_enhanced and res.enhanced_img is not None:
            enh = (res.enhanced_img * 255).astype(np.uint8)
            cv2.imwrite(str(self.save_dir / f"{stem}_enhanced.jpg"),
                        enh[..., ::-1])
