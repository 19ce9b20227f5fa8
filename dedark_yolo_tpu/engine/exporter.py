"""Exporter: serialize the compiled inference graph + weights.

The reference exports to 11 GPU/mobile formats via per-format toolchains
(ultralytics/engine/exporter.py:74-938). The TPU-native deployment artifacts:
StableHLO (the portable XLA IR any XLA runtime can load), a weight-embedded
jax.export .bin (the TPU analogue of a TensorRT engine), and a weights npz.
The reference's TensorFlow-family formats are ALSO supported via jax2tf
native lowering: saved_model, tflite (mobile), and frozen-graph pb —
round-tripped through AutoBackend for parity. ONNX rides the same jax2tf
function through tf2onnx behind an import guard (the packages are absent in
this environment — the guard raises the documented error; where they exist
the artifact is produced). TensorRT/CoreML remain out of scope (GPU/Apple
deployment toolchains).
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

    @staticmethod
    def _representative_dataset(a, batch, imgsz, n=16):
        """Yield letterboxed uint8 val batches for tflite int8 calibration
        (reference exporter tflite int8 path uses the val loader)."""
        def gen():
            from ..data import check_det_dataset
            from ..data.dataset import _scan_images
            from ..data.augment import letterbox
            from ..utils.patches import imread
            import numpy as np
            data = check_det_dataset(a.data)
            # _scan_images handles both dir and .txt-list val specs and
            # filters to image suffixes (same scan the datasets use)
            files = _scan_images(data.get("val") or data.get("train"))
            imgs = []
            for f in files:
                img = imread(f)
                if img is None:
                    continue
                lb, _, _ = letterbox(img, imgsz)
                imgs.append(np.ascontiguousarray(lb[..., ::-1]))
                if len(imgs) >= n * batch:
                    break
            for i in range(0, max(len(imgs) - batch + 1, 1), batch):
                chunk = imgs[i:i + batch]
                while chunk and len(chunk) < batch:
                    chunk.append(chunk[0])
                if chunk:
                    yield [np.stack(chunk).astype(np.uint8)]
        return gen

    def __call__(self, model, params, batch_stats):
        a = self.args
        fmt = (a.format or "stablehlo").lower()
        imgsz = a.imgsz if isinstance(a.imgsz, int) else 640
        out_dir = Path(a.project or "runs/export")
        out_dir.mkdir(parents=True, exist_ok=True)
        batch = max(1, int(a.batch))

        task = getattr(model, "task", "detect")
        if getattr(a, "fuse", False) and not getattr(model, "repconv_deploy",
                                                     False) and any(
                s.name == "RepC3" for s in getattr(model, "specs", ())):
            # fuse=True: re-parameterize RepConv branches to the deploy form
            # before serializing (reference exporter fuses via
            # attempt_load fuse=True; conv.py:268-291 fuse_convs)
            from ..nn.graph import DetectionModel
            from ..nn.layers import fuse_repconv_variables
            fused = fuse_repconv_variables({"params": params,
                                            "batch_stats": batch_stats})
            m2 = DetectionModel(model.yaml, repconv_deploy=True)
            m2.names = getattr(model, "names", m2.names)
            model, params, batch_stats = m2, fused["params"], \
                fused["batch_stats"]
            LOGGER.info("export fuse: RepConv -> deploy form")
        if getattr(a, "half", False):
            # bf16 deployment weights (reference half=True export): halves
            # the artifact and runs the MXU-native dtype; outputs stay f32
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)

        def infer(img):
            """Task-aware export program: exactly the model's canonical
            eval_outputs tuple (the reference exports every task,
            exporter.py:74-938), so artifacts cannot drift from live
            inference."""
            return model.eval_outputs(
                {"params": params, "batch_stats": batch_stats}, img)

        example = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
        OUTPUT_NAMES = {"detect": ["boxes", "scores"],
                        "segment": ["boxes", "scores", "coefs", "protos"],
                        "pose": ["boxes", "scores", "kpts"],
                        "classify": ["probs"]}

        comp_dtype = jnp.bfloat16 if getattr(a, "half", False) else jnp.float32

        def infer_u8(img_u8):
            outs = infer(img_u8.astype(comp_dtype) / 255.0)
            return tuple(o.astype(jnp.float32) for o in outs)

        def sidecar_meta(shapes=None):
            # deployment sidecar: the artifact's fixed shapes, task, class
            # names, and ORDERED output specs (name + shape) so AutoBackend /
            # InferenceServer can self-configure and demux runtime tensors
            # whose order the toolchain does not guarantee (tflite).
            # `shapes`: pass the already-traced output avals (jax.export /
            # concrete function) to avoid a redundant abstract re-trace.
            if shapes is None:
                shapes = jax.eval_shape(
                    infer_u8, jnp.zeros((batch, imgsz, imgsz, 3), jnp.uint8))
            names = getattr(model, "names", {}) or {}
            return {"imgsz": imgsz, "batch": batch, "nc": model.nc,
                    "task": task,
                    "names": {int(k): v for k, v in names.items()},
                    "outputs": [{"name": n, "shape": list(s.shape)}
                                for n, s in zip(OUTPUT_NAMES[task], shapes)]}

        if fmt in ("export", "bin", "serialized"):
            # weight-embedded compiled artifact, loadable by AutoBackend('.bin')
            # — the TPU analogue of a TensorRT engine export
            exp = jax.export.export(jax.jit(infer_u8))(
                jnp.zeros((batch, imgsz, imgsz, 3), jnp.uint8))
            path = out_dir / "model.bin"
            path.write_bytes(exp.serialize())
            import json
            (out_dir / "model.bin.json").write_text(
                json.dumps(sidecar_meta(exp.out_avals), indent=2))
            LOGGER.info(f"exported jax.export artifact to {path} "
                        f"({path.stat().st_size / 1e6:.1f} MB, + .json sidecar)")
            return str(path)
        if fmt in ("saved_model", "savedmodel", "tflite", "pb"):
            # TF-family formats (reference exporter.py saved_model/tflite/pb
            # rows) via jax2tf NATIVE lowering: the StableHLO program rides an
            # XlaCallModule op that both TF runtime and the TFLite converter
            # understand. Same uint8-in/(boxes, scores)-out contract as .bin.
            import tensorflow as tf
            from jax.experimental import jax2tf

            tfun = tf.function(
                jax2tf.convert(infer_u8), autograph=False,
                input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3),
                                               tf.uint8)])
            cf = tfun.get_concrete_function()
            import json
            meta = sidecar_meta(list(cf.outputs))
            if fmt in ("saved_model", "savedmodel"):
                path = out_dir / "model_saved_model"
                module = tf.Module()
                module.f = tfun
                tf.saved_model.save(module, str(path),
                                    signatures={"serving_default": cf})
                (path / "dedark_meta.json").write_text(json.dumps(meta))
            elif fmt == "tflite":
                conv = tf.lite.TFLiteConverter.from_concrete_functions([cf])
                if getattr(a, "int8", False):
                    # reference int8 flag ('CoreML/TF INT8 quantization'):
                    # dynamic-range weight quantization by default; with a
                    # dataset, calibrate activations too (representative set
                    # of letterboxed val images)
                    conv.optimizations = [tf.lite.Optimize.DEFAULT]
                    if getattr(a, "data", None):
                        conv.representative_dataset = \
                            self._representative_dataset(a, batch, imgsz)
                blob = conv.convert()
                path = out_dir / "model.tflite"
                path.write_bytes(blob)
                (out_dir / "model.tflite.json").write_text(json.dumps(meta))
            else:  # pb: frozen inference graph
                from tensorflow.python.framework.convert_to_constants import (
                    convert_variables_to_constants_v2)
                frozen = convert_variables_to_constants_v2(cf)
                path = out_dir / "model.pb"
                tf.io.write_graph(frozen.graph, str(out_dir), "model.pb",
                                  as_text=False)
                (out_dir / "model.pb.json").write_text(json.dumps(meta))
            LOGGER.info(f"exported {fmt} to {path}")
            return str(path)
        if fmt == "onnx":
            # Guarded ONNX path (reference exporter.py:138-186 export_onnx,
            # perform.py:41-53): ride the same jax2tf native-lowered function
            # the TF-family formats use, then convert with tf2onnx where the
            # toolchain exists. In this environment the conversion is blocked
            # (verified OnnxExporterError, docs/PARITY.md) — the import guard
            # raises the documented error instead of failing mid-convert.
            try:
                import tensorflow as tf
                import tf2onnx
                import onnx  # noqa: F401  (tf2onnx writes onnx protos)
            except ImportError as e:
                raise RuntimeError(
                    "ONNX export needs the 'tf2onnx' and 'onnx' packages, "
                    "which are not available in this environment (see "
                    "docs/PARITY.md). Use format='bin' (jax.export), "
                    "'saved_model', 'tflite', or 'stablehlo' instead."
                ) from e
            from jax.experimental import jax2tf
            tfun = tf.function(
                jax2tf.convert(infer_u8), autograph=False,
                input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3),
                                               tf.uint8, name="images")])
            path = out_dir / "model.onnx"
            tf2onnx.convert.from_function(
                tfun,
                input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3),
                                               tf.uint8, name="images")],
                opset=int(getattr(a, "opset", None) or 17),
                output_path=str(path))
            import json
            (out_dir / "model.onnx.json").write_text(
                json.dumps(sidecar_meta(), indent=2))
            LOGGER.info(f"exported ONNX to {path}")
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
        raise ValueError(
            f"unsupported export format '{fmt}' (supported: bin, stablehlo, "
            f"npz, saved_model, tflite, pb, onnx)")
