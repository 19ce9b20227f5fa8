"""YOLO facade: the user-level API (counterpart of ultralytics/engine/model.py).

YOLO('yolov8l.yaml')   -> new model from architecture yaml (model.py:84-111 _new)
YOLO('best.npz')       -> model + weights from a checkpoint (model.py:114-135 _load)
.train/.val/.predict/.export/.benchmark delegate to the engine classes like the
reference TASK_MAP dispatch (model.py:17-26, 324-358).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..cfg import get_cfg, model_yaml_load, DEFAULT_CFG_DICT
from ..nn.graph import DetectionModel
from ..utils import LOGGER
from ..utils.checkpoint import load_checkpoint, restore_tree


class YOLO:
    def __init__(self, model="yolov8l.yaml", task="detect"):
        self.task = task
        self.overrides = {}
        self.params = None
        self.batch_stats = None
        self.ckpt_path = None
        self.metrics = None
        self._user_callbacks = {}
        if isinstance(model, (list, tuple)):
            # model ensemble: every member forwards and decoded candidates are
            # concatenated before NMS (reference attempt_load_weights/Ensemble,
            # tasks.py:534-546 torch.cat(outputs, 1)) — output-level merging,
            # valid for independently trained checkpoints
            self._load_ensemble([str(m) for m in model])
            return
        model = str(model)
        if model.endswith((".yaml", ".yml")):
            self._new(model)
        elif model.endswith(".npz"):
            self._load(model)
        elif model.endswith((".bin", ".tflite")) or \
                (Path(model) / "saved_model.pb").is_file():
            # exported artifact (.bin jax.export / .tflite / saved_model
            # dir): val/predict route through AutoBackend like the
            # reference's standalone modes (validator.py:116-123,
            # predictor.py setup_model); train/export need live params.
            self._backend_spec = model
            self.model = None
        else:
            raise ValueError(
                f"unsupported model spec '{model}' (expect .yaml, .npz "
                "checkpoint, or exported .bin/.tflite/saved_model)")

    def _new(self, cfg_path):
        d = model_yaml_load(cfg_path)
        self.model = DetectionModel(d)
        self.model_yaml = d
        self.overrides["model"] = cfg_path

    def _load(self, ckpt_path):
        meta, flat = load_checkpoint(ckpt_path)
        train_args = meta.get("train_args") or {}
        # the traced filter math must match training (a 'reference'-contrast
        # checkpoint evaluated with 'channel' contrast is a silently
        # different function)
        cm = train_args.get("contrast_mode", "channel")
        self.model = DetectionModel(meta["model_yaml"], contrast_mode=cm)
        self.model_yaml = meta["model_yaml"]
        self.ckpt_path = ckpt_path
        self.ckpt_meta = meta
        imgsz = int(train_args.get("imgsz", 640))
        example = jax.eval_shape(self.model.module.init, jax.random.PRNGKey(0),
                                 jax.ShapeDtypeStruct((1, imgsz, imgsz, 3),
                                                      np.float32))
        section = "ema" if any(k.startswith("ema/") for k in flat) else "params"
        self.params = restore_tree(flat, section, example["params"])
        # EMA-averaged batch_stats pair with EMA params (ModelEMA averages
        # buffers too); fall back to raw stats for older checkpoints
        bs_section = "ema_bs" if (section == "ema" and
                                  any(k.startswith("ema_bs/") for k in flat)) \
            else "batch_stats"
        self.batch_stats = restore_tree(flat, bs_section, example["batch_stats"])
        # carry forward training args like the reference (model.py:129-133);
        # 'model' points at the checkpoint so a later .train() builds the
        # checkpoint's architecture (and warm-starts from it), not the
        # default yaml
        self.overrides["model"] = str(ckpt_path)
        for k in ("imgsz", "data", "single_cls", "contrast_mode"):
            if k in train_args:
                self.overrides[k] = train_args[k]
        if "names" in train_args:
            self.model.names = train_args["names"]

    def _load_ensemble(self, paths):
        self._load(paths[0])
        self.members = [(self.params, self.batch_stats)]
        if len(paths) == 1:
            return
        for p in paths[1:]:
            other = YOLO(p)
            assert other.model_yaml == self.model_yaml, (
                "ensemble members must share one architecture yaml (the "
                "reference allows mixed archs; here one compiled graph serves "
                "all members)")
            self.members.append((other.params, other.batch_stats))
        LOGGER.info(f"ensembled {len(self.members)} checkpoints "
                    "(output-level candidate merge before NMS)")

    # ------------------------------------------------------------------ modes
    def _sync_model_opts(self, args):
        """Rebuild the graph when an args flag changes pure model semantics
        (contrast_mode) — params are untouched, only the traced math changes
        (the reference-faithful contrast quirk, nn/enhance.py)."""
        cm = getattr(args, "contrast_mode", None) or "channel"
        if self.model is not None and self.model_yaml is not None and \
                getattr(self.model.module, "contrast_mode", "channel") != cm:
            names = getattr(self.model, "names", None)
            self.model = DetectionModel(self.model_yaml, contrast_mode=cm)
            if names:
                self.model.names = names

    def _ensure_params(self, imgsz=640):
        if self.params is None:
            LOGGER.info("initializing random weights (no checkpoint loaded)")
            v = self.model.init(jax.random.PRNGKey(0), imgsz=imgsz)
            self.params, self.batch_stats = v["params"], v["batch_stats"]

    def train(self, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "train"}
        task = getattr(self.model, "task", "detect")
        # TASK_MAP dispatch (reference engine/model.py:17-26)
        if task == "classify":
            from .classify import ClassificationTrainer
            trainer = ClassificationTrainer(overrides)
        elif task == "segment":
            from .segment import SegmentationTrainer
            trainer = SegmentationTrainer(overrides)
        elif task == "pose":
            from .pose import PoseTrainer
            trainer = PoseTrainer(overrides)
        else:
            from .trainer import DetectionTrainer
            trainer = DetectionTrainer(overrides)
        # fine-tune from held checkpoint weights (reference model.py:348-350:
        # trainer.get_model(weights=self.model when loaded from .pt))
        if getattr(self, "params", None) is not None and \
                not overrides.get("resume"):
            trainer.init_state = (self.params, self.batch_stats)
        # user callbacks registered via add_callback (reference
        # model.py:399-401 + trainer.add_callback)
        for ev, fns in self._user_callbacks.items():
            trainer.callbacks.setdefault(ev, []).extend(fns)
        self.trainer = trainer
        metrics = trainer.train()
        # reload best like the reference (model.py:352-358)
        best = trainer.wdir / "best.npz"
        if best.is_file():
            self._load(str(best))
        self.metrics = metrics
        return metrics

    def _make_backend(self, args):
        from .autobackend import AutoBackend
        imgsz = args.imgsz if isinstance(args.imgsz, int) else 640
        backend = AutoBackend(self._backend_spec, imgsz=imgsz,
                              batch=max(1, int(args.batch)))
        # the artifact's fixed shapes win (sidecar); rect val would need
        # per-bucket artifacts, so exported-artifact val runs square
        args.imgsz = backend.imgsz
        args.batch = backend.batch
        args.rect = False
        return backend

    def val(self, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "val"}
        args = get_cfg(DEFAULT_CFG_DICT, overrides)
        if getattr(self, "_backend_spec", None):
            backend = self._make_backend(args)
            # task-validator dispatch for exported artifacts too (the
            # reference vals every AutoBackend format through TASK_MAP)
            btask = getattr(backend, "task", "detect")
            if btask == "segment":
                from .segment import SegmentationValidator
                validator = SegmentationValidator(args=args)
            elif btask == "pose":
                from .pose import PoseValidator
                spec = next((o for o in backend._outputs or []
                             if o["name"] == "kpts"), None)
                kshape = tuple(spec["shape"][2:]) if spec else (17, 3)
                validator = PoseValidator(args=args, kpt_shape=kshape)
            elif btask == "classify":
                from .classify import ClassificationValidator
                validator = ClassificationValidator(args=args)
            else:
                from .validator import DetectionValidator
                validator = DetectionValidator(args=args)
            self.metrics = validator(model=backend)
            return self.metrics
        self._ensure_params(args.imgsz if isinstance(args.imgsz, int) else 640)
        self._sync_model_opts(args)
        task = getattr(self.model, "task", "detect")
        # TASK_MAP dispatch (reference engine/model.py:17-26 routes every task
        # to its own validator)
        if task == "segment":
            from .segment import SegmentationValidator
            validator = SegmentationValidator(args=args)
        elif task == "pose":
            from .pose import PoseValidator, model_kpt_shape
            validator = PoseValidator(args=args,
                                      kpt_shape=model_kpt_shape(self.model))
        elif task == "classify":
            from .classify import ClassificationValidator
            validator = ClassificationValidator(args=args)
        else:
            from .validator import DetectionValidator
            validator = DetectionValidator(args=args)
        self.metrics = validator(model=self.model, params=self.params,
                                 batch_stats=self.batch_stats)
        return self.metrics

    def predict(self, source, stream=False, **kwargs):
        # mode stays "predict" unless a caller (track()) routed another in
        overrides = {**self.overrides, **kwargs}
        overrides["mode"] = kwargs.get("mode", "predict")
        args = get_cfg(DEFAULT_CFG_DICT, overrides)
        if getattr(self, "_backend_spec", None):
            backend = self._make_backend(args)
            # exported artifacts carry their task in the sidecar; dispatch to
            # the task predictor like the live-model path below
            btask = getattr(backend, "task", "detect")
            if btask == "segment":
                from .segment import SegmentationPredictor as BPred
            elif btask == "pose":
                from .pose import PosePredictor as BPred
            elif btask == "classify":
                from .classify import ClassificationPredictor as BPred
            else:
                from .predictor import DetectionPredictor as BPred
            predictor = BPred(args=args, model=backend,
                              names=backend.names)
            self.predictor = predictor
            return predictor(source, stream=stream)
        self._ensure_params(args.imgsz if isinstance(args.imgsz, int) else 640)
        self._sync_model_opts(args)
        names = getattr(self.model, "names", {})
        save_dir = None
        if args.project:
            from ..utils import increment_dir
            save_dir = str(increment_dir(
                Path(args.project) / (args.name or "predict"),
                getattr(args, "exist_ok", False)))
        task = getattr(self.model, "task", "detect")
        # TASK_MAP dispatch (reference engine/model.py:17-26 routes every task
        # to its own predictor)
        if task == "segment":
            from .segment import SegmentationPredictor as Pred
        elif task == "pose":
            from .pose import PosePredictor as Pred
        elif task == "classify":
            from .classify import ClassificationPredictor as Pred
        else:
            from .predictor import DetectionPredictor as Pred
        predictor = Pred(args=args, model=self.model, params=self.params,
                         batch_stats=self.batch_stats, names=names,
                         save_dir=save_dir,
                         members=getattr(self, "members", None))
        self.predictor = predictor
        return predictor(source, stream=stream)

    def __call__(self, source, **kwargs):
        kwargs.setdefault("conf", 0.4)  # reference model.py:213 default override
        return self.predict(source, **kwargs)

    def track(self, source, stream=False, persist=False, **kwargs):
        """Multi-object tracking over a video/image-sequence source
        (reference engine/model.py:229-250 — whose `ultralytics.trackers`
        import target is missing from the fork; implemented here in
        dedark_yolo_tpu/trackers/). Detection runs batched on the device via
        the normal predictor stream; association runs on the host per frame.

        persist=True reuses the tracker from the previous .track() call
        (continuing IDs across calls on the same stream); otherwise a fresh
        tracker is built from the `tracker` config (botsort.yaml default).
        """
        from ..trackers import make_tracker, track_results
        # ByteTrack needs the low-confidence candidates as input
        kwargs.setdefault("conf", 0.1)
        kwargs["mode"] = "track"
        tracker_name = kwargs.pop("tracker",
                                  self.overrides.get("tracker") or
                                  DEFAULT_CFG_DICT.get("tracker") or
                                  "botsort.yaml")
        if not (persist and getattr(self, "_tracker", None) is not None):
            self._tracker = make_tracker(tracker_name)
        # saving must happen AFTER ids are stamped, so it is lifted out of the
        # predictor (which writes pre-tracking) into the tracking wrapper
        save = bool(kwargs.pop("save", False))
        save_txt = bool(kwargs.pop("save_txt", False))
        save_crop = bool(kwargs.pop("save_crop", False))
        save_conf = bool(kwargs.get("save_conf", False))
        # force predictor-side saving OFF (cfg defaults could re-enable it)
        kwargs.update(save=False, save_txt=False, save_crop=False)
        inner = track_results(self.predict(source, stream=True, **kwargs),
                              self._tracker,
                              persist_between_sources=persist)

        def gen():
            from pathlib import Path as _P
            writers = {}
            try:
                for k, res in enumerate(inner):
                    if save or save_txt or save_crop:
                        sd = _P(self.predictor.save_dir)
                        p = _P(res.path)
                        meta = getattr(res, "source_meta", None)
                        if save and meta is not None:
                            # video frame: mux one annotated mp4 per source
                            # (mirrors predictor _write, ids included)
                            import cv2
                            w = writers.get(res.path)
                            if w is None:
                                sd.mkdir(parents=True, exist_ok=True)
                                h, wd = res.orig_shape
                                w = cv2.VideoWriter(
                                    str(sd / f"{p.stem}_track.mp4"),
                                    cv2.VideoWriter_fourcc(*"mp4v"),
                                    max(float(meta[1]), 1.0), (wd, h))
                                writers[res.path] = w
                            w.write(res.plot()[..., ::-1])
                        elif save:
                            res.save(sd / f"{p.stem or 'frame'}_{k:05d}.jpg")
                        if save_txt:
                            stem = f"{p.stem or 'frame'}_{k:05d}"
                            res.save_txt(sd / "labels" / f"{stem}.txt",
                                         save_conf=save_conf)
                        if save_crop:
                            res.save_crop(sd / "crops",
                                          file_name=p.stem or "frame")
                    yield res
            finally:
                for w in writers.values():
                    w.release()

        g = gen()
        return g if stream else list(g)

    def export(self, **kwargs):
        from .exporter import Exporter
        overrides = {**self.overrides, **kwargs, "mode": "export"}
        if "data" not in kwargs:
            # train_args carry the training dataset yaml into overrides; on a
            # deployment machine it usually doesn't exist — int8 calibration
            # must only run on an EXPLICITLY passed dataset
            overrides.pop("data", None)
        args = get_cfg(DEFAULT_CFG_DICT, overrides)
        self._ensure_params(args.imgsz if isinstance(args.imgsz, int) else 640)
        return Exporter(args)(self.model, self.params, self.batch_stats)

    def benchmark(self, **kwargs):
        overrides = {**self.overrides, **kwargs}
        overrides.pop("model", None)
        fmts = overrides.pop("formats", None)
        if fmts:
            # reference benchmark(): export every deployment format and
            # measure each (size, throughput, mAP) through AutoBackend.
            # formats=True uses the default set; a list/tuple selects.
            from .benchmarks import benchmark_formats
            if isinstance(fmts, (list, tuple)):
                overrides["formats"] = tuple(fmts)
            return benchmark_formats(self, **overrides)
        from .benchmarks import benchmark
        return benchmark(self, **overrides)

    def fuse(self):
        """Deploy-time fusion (reference BaseModel.fuse, tasks.py:153-178).

        Conv+BN folding is a no-op here: under XLA the eval-mode BN is an
        affine epilogue fused into the convolution at compile time. RepConv,
        however, is a STRUCTURAL merge (3 branches -> one biased 3x3 conv,
        reference conv.py:268-291 fuse_convs) that changes inference FLOPs
        and XLA cannot do on its own — when the graph contains RepConv
        blocks, rebuild it in deploy form and re-parameterize the weights."""
        from ..utils import LOGGER
        has_rep = any(s.name == "RepC3" for s in
                      getattr(self.model, "specs", ()))
        if not has_rep:
            LOGGER.info("fuse(): conv+BN folding happens inside XLA "
                        "compilation; no ahead-of-time fusion needed")
            return self
        if getattr(self.model, "repconv_deploy", False):
            return self  # already fused
        if self.params is None:
            self._ensure_params(int(self.overrides.get("imgsz", 640)))
        from ..nn.graph import DetectionModel
        from ..nn.layers import fuse_repconv_variables
        fused = fuse_repconv_variables({"params": self.params,
                                        "batch_stats": self.batch_stats})
        model = DetectionModel(self.model.yaml, repconv_deploy=True)
        model.names = self.model.names
        self.model = model
        self.params = fused["params"]
        self.batch_stats = fused["batch_stats"]
        self._collapse_members()
        LOGGER.info("fuse(): RepConv branches re-parameterized to deploy "
                    "form (single 3x3 conv per block)")
        return self

    @property
    def names(self):
        return getattr(self.model, "names", {})

    @property
    def device(self):
        """Device the engines will actually run on (reference
        model.py:389-392): honors a `.to(device)` / device= override,
        else the first default device."""
        import jax
        dev = self.overrides.get("device")
        try:
            return str(jax.devices(dev)[0] if dev else jax.devices()[0])
        except Exception:
            return str(dev) if dev else "cpu"

    @property
    def transforms(self):
        """Inference transforms attached to a checkpoint (reference
        model.py:394-397); this framework letterboxes in the predictor, so
        there is never a checkpoint-carried transform."""
        return None

    def load(self, weights):
        """Transfer weights from a checkpoint into the CURRENT architecture
        by path+shape intersection (reference model.py:162-171 load ->
        BaseModel.load intersect_dicts) — head leaves with a different nc
        stay freshly initialized."""
        from ..utils.checkpoint import transfer_tree
        self._ensure_params()
        other = YOLO(str(weights))
        self.params, n_p, t_p = transfer_tree(other.params, self.params)
        self.batch_stats, n_b, t_b = transfer_tree(other.batch_stats,
                                                   self.batch_stats)
        LOGGER.info(f"transferred {n_p + n_b}/{t_p + t_b} items from "
                    f"{weights}")
        self._collapse_members()
        return self

    def reset_weights(self):
        """Re-initialize all parameters in place (reference model.py:149-160;
        there: reset_parameters per module + requires_grad, here: a fresh
        PRNG init of the same graph). Deliberately NOT the construction key
        (PRNGKey(0)): resetting must yield different weights than a fresh
        facade the way torch's reset_parameters draws new randomness. A
        per-call counter is folded in so consecutive resets also differ
        from each other (torch draws fresh randomness each call)."""
        import jax
        imgsz = int(self.overrides.get("imgsz", 640))
        self._reset_count = getattr(self, "_reset_count", 0) + 1
        key = jax.random.fold_in(jax.random.PRNGKey(0x5EED),
                                 self._reset_count)
        v = self.model.init(key, imgsz=imgsz)
        self.params, self.batch_stats = v["params"], v["batch_stats"]
        self._collapse_members()
        return self

    def _collapse_members(self):
        """After load()/reset_weights() mutate params, an ensemble's cached
        member weights no longer represent the facade — predict() iterates
        `members`, so stale entries would silently keep serving the old
        checkpoints. Collapse to the current weights."""
        if getattr(self, "members", None) and len(self.members) > 1:
            LOGGER.warning("ensemble collapsed to a single member by "
                           "load()/reset_weights()")
        if getattr(self, "members", None):
            self.members = [(self.params, self.batch_stats)]

    def to(self, device):
        """Pin subsequent work to a platform ('cpu'/'tpu'/'axon'...) by
        setting the `device` override the engines consume (reference
        model.py:360-368 .to(device); XLA owns placement, so this selects
        WHICH devices the mesh/jit use rather than moving tensors eagerly)."""
        self.overrides["device"] = str(device)
        return self

    def add_callback(self, event: str, func):
        """Register a trainer-bus callback (reference model.py:399-401);
        applied to every trainer this facade constructs."""
        self._user_callbacks.setdefault(event, []).append(func)

    def clear_callback(self, event: str):
        """Clear user callbacks for one event (reference model.py:403-405)."""
        self._user_callbacks[event] = []

    def tune(self, data=None, **kwargs):
        """Hyperparameter evolution on this model's architecture (reference
        model.py:370-382 run_ray_tune; here the built-in evolve tuner).
        Returns (best_cfg, results-sorted-by-fitness)."""
        from ..utils.tuner import run_tune
        overrides = {**self.overrides, **kwargs}
        model_yaml = overrides.pop("model", None) or self.model_yaml
        # always pop 'data' so a checkpoint-carried override can't reach
        # run_tune twice (once positionally, once via **overrides)
        data = data or overrides.pop("data", None)
        overrides.pop("data", None)
        assert data, "tune() needs data=<dataset yaml>"
        return run_tune(model_yaml, data, **{
            k: v for k, v in overrides.items() if k != "mode"})

    def info(self):
        self._ensure_params()
        n = self.model.num_params({"params": self.params})
        LOGGER.info(f"model: {len(self.model.specs)} layers, {n:,} parameters")
        return len(self.model.specs), n
