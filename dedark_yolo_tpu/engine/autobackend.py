"""AutoBackend: uniform inference interface over deployment formats.

Counterpart of reference ultralytics/nn/autobackend.py:41-492, which muxes 11
GPU/mobile formats. The TPU deployment surface is:
  - .npz    framework checkpoints (weights + yaml; rebuilt and jitted here);
  - .bin    jax.export serialized artifacts (a compiled, weight-embedded
            StableHLO program — the TPU analogue of a TensorRT engine);
  - .tflite mobile flatbuffers (exported via jax2tf; run by the TFLite
            interpreter on CPU, like the reference's tflite row);
  - saved_model/ directories (TF runtime serving_default signature);
  - .yaml   architecture-only (random weights; for smoke tests).

`forward(img_u8)` returns the task's exported tuple — detect (boxes_xywh,
scores), segment (boxes, scores, coefs, protos), pose (boxes, scores, kpts),
classify (probs,) — in EXPORT order regardless of format (`_demux` restores
it from the sidecar's output specs where runtimes reorder). `warmup()`
compiles/executes once at the configured shape (reference autobackend.py:451).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOGGER


class AutoBackend:
    def __init__(self, model_spec, imgsz=640, batch=1, half=False):
        self.imgsz = imgsz
        self.batch = batch
        self.half = half
        self.format = self._model_type(model_spec)
        self.names = {}
        self.task = "detect"
        self.nc = None
        self._outputs = None  # ordered [{name, shape}] from the sidecar
        LOGGER.info(f"AutoBackend: loading {model_spec} as '{self.format}'")
        if self.format == "exported":
            data = Path(model_spec).read_bytes()
            self._exported = jax.export.deserialize(bytearray(data))
            # jax.export preserves the exported tuple order exactly
            self._fn = lambda img: self._exported.call(img)
            self._read_sidecar(Path(str(model_spec) + ".json"))
        elif self.format == "tflite":
            import tensorflow as tf
            self._read_sidecar(Path(str(model_spec) + ".json"))
            interp = tf.lite.Interpreter(model_path=str(model_spec))
            interp.allocate_tensors()
            inp = interp.get_input_details()[0]
            outs = interp.get_output_details()

            def fn(img_u8):
                interp.set_tensor(inp["index"],
                                  np.asarray(img_u8, np.uint8))
                interp.invoke()
                res = [interp.get_tensor(o["index"]) for o in outs]
                return self._demux(res)

            self._fn = fn
        elif self.format == "saved_model":
            import tensorflow as tf
            self._read_sidecar(Path(model_spec) / "dedark_meta.json")
            loaded = tf.saved_model.load(str(model_spec))
            sig = loaded.signatures["serving_default"]

            def fn(img_u8, _sig=sig, _keep=loaded):
                res = _sig(tf.constant(np.asarray(img_u8, np.uint8)))
                return self._demux([v.numpy() for v in res.values()])

            self._fn = fn
        else:
            from .model import YOLO
            y = YOLO(str(model_spec))
            y._ensure_params(imgsz)
            self.names = y.names
            model, params, batch_stats = y.model, y.params, y.batch_stats
            self.task = getattr(model, "task", "detect")
            self.nc = getattr(model, "nc", self.nc)
            dtype = jnp.bfloat16 if half else jnp.float32
            if half:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
                    params)
            @jax.jit
            def fn(img_u8):
                # the model's canonical per-task tuple — same definition the
                # exporter serializes, so live and artifact backends agree
                outs = model.eval_outputs(
                    {"params": params, "batch_stats": batch_stats},
                    img_u8.astype(dtype) / 255.0)
                return tuple(o.astype(jnp.float32) for o in outs)

            self._fn = fn

    def _read_sidecar(self, path):
        if Path(path).is_file():
            import json
            meta = json.loads(Path(path).read_text())
            self.imgsz = int(meta.get("imgsz", self.imgsz))
            self.batch = int(meta.get("batch", self.batch))
            self.task = meta.get("task", self.task)
            self.nc = meta.get("nc", self.nc)
            self._outputs = meta.get("outputs")
            # identically-shaped outputs can only resolve in converter order —
            # surface that once at load, not as silent per-call ambiguity
            shapes = [tuple(o["shape"]) for o in self._outputs or []]
            if len(set(shapes)) < len(shapes):
                LOGGER.warning(
                    f"{Path(path).name}: output shapes {shapes} are not all "
                    "distinct; runtimes that reorder outputs (tflite) will be "
                    "demuxed in emission order for the ambiguous pair")
            self.names = {int(k): v for k, v in meta.get("names", {}).items()}

    def _demux(self, res):
        """Reorder runtime output tensors into the exported order.

        tflite (and in principle saved_model signature dicts) do not
        guarantee output order; the sidecar's ordered output shapes do. Match
        each spec to a distinct runtime tensor by exact shape; identically
        shaped outputs (e.g. nc == nm) resolve in remaining-order. Without a
        sidecar, fall back to the detect heuristic (boxes = last dim 4)."""
        if self._outputs and len(self._outputs) == len(res):
            remaining = list(res)
            ordered = []
            for spec in self._outputs:
                shape = tuple(spec["shape"])
                i = next((i for i, r in enumerate(remaining)
                          if tuple(r.shape) == shape), None)
                if i is None:
                    LOGGER.warning(
                        f"AutoBackend: no runtime output matches sidecar "
                        f"shape {shape} for '{spec['name']}' (got "
                        f"{[r.shape for r in remaining]}); taking the next "
                        "tensor in emission order")
                    i = 0
                ordered.append(remaining.pop(i))
            return tuple(jnp.asarray(o) for o in ordered)
        if len(res) == 2:
            boxes = next(r for r in res if r.shape[-1] == 4)
            scores = next(r for r in res if r is not boxes)
            return jnp.asarray(boxes), jnp.asarray(scores)
        return tuple(jnp.asarray(r) for r in res)

    @staticmethod
    def _model_type(spec):
        s = str(spec)
        if s.endswith(".bin"):
            return "exported"
        if s.endswith(".npz"):
            return "checkpoint"
        if s.endswith(".tflite"):
            return "tflite"
        if (Path(s) / "saved_model.pb").is_file():
            return "saved_model"
        if s.endswith((".yaml", ".yml")):
            return "yaml"
        raise ValueError(f"unrecognized model format: {spec}")

    def forward(self, img_u8):
        """img_u8: (B, H, W, 3) uint8 RGB -> the task's exported tuple:
        detect (boxes_xywh, scores); segment (boxes, scores, coefs, protos);
        pose (boxes, scores, kpts); classify (probs,)."""
        return self._fn(jnp.asarray(img_u8))

    __call__ = forward

    def warmup(self):
        dummy = np.zeros((self.batch, self.imgsz, self.imgsz, 3), np.uint8)
        out = self.forward(dummy)
        jax.block_until_ready(out)
        return self
