"""Exporter: serialize the compiled inference graph + weights.

The reference exports to 11 GPU/mobile formats via per-format toolchains
(ultralytics/engine/exporter.py:74-938). For a TPU-native stack the deployment
artifacts are different: StableHLO (the portable XLA IR any XLA runtime can load),
a weights npz, and the checkpoint container itself. ONNX/TensorRT/CoreML are GPU
deployment paths out of scope for TPU serving.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOGGER, save_checkpoint


class Exporter:
    def __init__(self, args):
        self.args = args

    def __call__(self, model, params, batch_stats):
        a = self.args
        fmt = (a.format or "stablehlo").lower()
        imgsz = a.imgsz if isinstance(a.imgsz, int) else 640
        out_dir = Path(a.project or "runs/export")
        out_dir.mkdir(parents=True, exist_ok=True)
        batch = max(1, int(a.batch))

        def infer(img):
            variables = {"params": params, "batch_stats": batch_stats}
            raw = model.module.apply(variables, img, train=False)
            from ..nn.heads import decode_detections
            return decode_detections(raw, model.nc, model.strides, model.reg_max)

        example = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
        if fmt in ("export", "bin", "serialized"):
            # weight-embedded compiled artifact, loadable by AutoBackend('.bin')
            # — the TPU analogue of a TensorRT engine export
            def infer_u8(img_u8):
                b, s = infer(img_u8.astype(jnp.float32) / 255.0)
                return b.astype(jnp.float32), s.astype(jnp.float32)

            exp = jax.export.export(jax.jit(infer_u8))(
                jnp.zeros((batch, imgsz, imgsz, 3), jnp.uint8))
            path = out_dir / "model.bin"
            path.write_bytes(exp.serialize())
            # deployment sidecar: the artifact's fixed shapes + class names, so
            # AutoBackend / InferenceServer can self-configure from the file
            import json
            names = getattr(model, "names", {}) or {}
            (out_dir / "model.bin.json").write_text(json.dumps({
                "imgsz": imgsz, "batch": batch, "nc": model.nc,
                "names": {int(k): v for k, v in names.items()},
            }, indent=2))
            LOGGER.info(f"exported jax.export artifact to {path} "
                        f"({path.stat().st_size / 1e6:.1f} MB, + .json sidecar)")
            return str(path)
        if fmt == "stablehlo":
            lowered = jax.jit(infer).lower(example)
            path = out_dir / "model.stablehlo.mlir"
            path.write_text(lowered.as_text())
            LOGGER.info(f"exported StableHLO to {path}")
            return str(path)
        if fmt in ("npz", "savedmodel_npz", "weights"):
            path = out_dir / "model_weights.npz"
            save_checkpoint(path, params=params, batch_stats=batch_stats,
                            model_yaml=model.yaml)
            LOGGER.info(f"exported weights to {path}")
            return str(path)
        raise ValueError(f"unsupported export format '{fmt}' "
                         f"(supported: stablehlo, npz)")
