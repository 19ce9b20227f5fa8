"""AutoBackend: uniform inference interface over deployment formats.

Counterpart of reference ultralytics/nn/autobackend.py:41-492, which muxes 11
GPU/mobile formats. The TPU deployment surface is:
  - .npz    framework checkpoints (weights + yaml; rebuilt and jitted here);
  - .bin    jax.export serialized artifacts (a compiled, weight-embedded
            StableHLO program — the TPU analogue of a TensorRT engine);
  - .yaml   architecture-only (random weights; for smoke tests).

`forward(img_u8)` always returns (boxes_xywh (B,N,4), scores (B,N,nc)) like the
eval decode, regardless of format. `warmup()` compiles/executes once at the
configured shape (reference autobackend.py:451).
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
        LOGGER.info(f"AutoBackend: loading {model_spec} as '{self.format}'")
        if self.format == "exported":
            data = Path(model_spec).read_bytes()
            self._exported = jax.export.deserialize(bytearray(data))
            self._fn = lambda img: self._exported.call(img)
            # deployment sidecar (written by the exporter): fixed shapes +
            # class names travel with the artifact
            sidecar = Path(str(model_spec) + ".json")
            if sidecar.is_file():
                import json
                meta = json.loads(sidecar.read_text())
                self.imgsz = int(meta.get("imgsz", imgsz))
                self.batch = int(meta.get("batch", batch))
                self.names = {int(k): v
                              for k, v in meta.get("names", {}).items()}
        else:
            from .model import YOLO
            y = YOLO(str(model_spec))
            y._ensure_params(imgsz)
            self.names = y.names
            model, params, batch_stats = y.model, y.params, y.batch_stats
            dtype = jnp.bfloat16 if half else jnp.float32
            if half:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
                    params)

            @jax.jit
            def fn(img_u8):
                x = img_u8.astype(dtype) / 255.0
                v = {"params": params, "batch_stats": batch_stats}
                boxes, scores = model.apply_eval(v, x)
                return boxes.astype(jnp.float32), scores.astype(jnp.float32)

            self._fn = fn

    @staticmethod
    def _model_type(spec):
        s = str(spec)
        if s.endswith(".bin"):
            return "exported"
        if s.endswith(".npz"):
            return "checkpoint"
        if s.endswith((".yaml", ".yml")):
            return "yaml"
        raise ValueError(f"unrecognized model format: {spec}")

    def forward(self, img_u8):
        """img_u8: (B, H, W, 3) uint8 RGB -> (boxes_xywh, scores)."""
        return self._fn(jnp.asarray(img_u8))

    __call__ = forward

    def warmup(self):
        dummy = np.zeros((self.batch, self.imgsz, self.imgsz, 3), np.uint8)
        out = self.forward(dummy)
        jax.block_until_ready(out)
        return self
