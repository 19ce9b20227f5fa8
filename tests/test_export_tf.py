"""TF-family export formats (reference exporter.py saved_model/tflite/pb
rows) via jax2tf native lowering, round-tripped through AutoBackend.

These compile XLA graphs and run the TF converter — slow tier.
"""

from pathlib import Path

import numpy as np
import pytest

TINY = str(Path(__file__).parent / "tiny_model.yaml")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def live(tmp_path_factory):
    pytest.importorskip("tensorflow")
    from dedark_yolo_tpu import YOLO
    from dedark_yolo_tpu.engine.autobackend import AutoBackend
    m = YOLO(TINY)
    m._ensure_params(96)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8)
    bk = AutoBackend(TINY, imgsz=96, batch=2)
    lb, ls = (np.asarray(x) for x in bk.forward(img))
    return m, img, lb, ls


def test_export_tflite_roundtrip(live, tmp_path):
    from dedark_yolo_tpu.engine.autobackend import AutoBackend
    m, img, lb, ls = live
    p = m.export(format="tflite", imgsz=96, batch=2, project=str(tmp_path))
    assert p.endswith(".tflite") and Path(p + ".json").is_file()
    bk = AutoBackend(p)
    assert bk.imgsz == 96 and bk.batch == 2  # sidecar self-configuration
    bb, bs = (np.asarray(x) for x in bk.forward(img))
    assert bb.shape == lb.shape and bs.shape == ls.shape
    # XNNPACK reassociates float math: near-parity, not bit-parity
    assert np.abs(bb - lb).max() < 1e-2
    assert np.abs(bs - ls).max() < 1e-4


def test_export_saved_model_roundtrip_and_facade(live, tmp_path):
    from dedark_yolo_tpu import YOLO
    from dedark_yolo_tpu.engine.autobackend import AutoBackend
    m, img, lb, ls = live
    p = m.export(format="saved_model", imgsz=96, batch=2,
                 project=str(tmp_path))
    assert (Path(p) / "saved_model.pb").is_file()
    bk = AutoBackend(p)
    bb, bs = (np.asarray(x) for x in bk.forward(img))
    np.testing.assert_allclose(bb, lb, atol=1e-4)
    np.testing.assert_allclose(bs, ls, atol=1e-5)
    # facade routes the directory spec through AutoBackend (like .bin)
    y = YOLO(p)
    assert getattr(y, "_backend_spec", None) == p


def test_export_pb_frozen_graph(live, tmp_path):
    import tensorflow as tf
    m, img, lb, ls = live
    p = m.export(format="pb", imgsz=96, batch=2, project=str(tmp_path))
    assert Path(p).is_file() and Path(p).stat().st_size > 10000
    gd = tf.compat.v1.GraphDef()
    gd.ParseFromString(Path(p).read_bytes())
    assert len(gd.node) > 0  # parseable frozen inference graph


def _mk_imgs(tmp_path, n=2):
    import cv2
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(3)
    for k in range(n):
        img = rng.integers(60, 200, (100, 140, 3), dtype=np.uint8)
        cv2.circle(img, (60, 50), 20, (220, 60, 60), -1)
        cv2.imwrite(str(d / f"im{k}.jpg"), img)
    return d


@pytest.mark.parametrize("fmt", ["bin", "tflite"])
def test_export_segment_task_roundtrip(fmt, tmp_path):
    """Task-aware export (reference exports every task): a segment artifact
    carries (boxes, scores, coefs, protos) + task sidecar; the facade routes
    it to SegmentationPredictor and masks match the live model."""
    import yaml
    from test_task_dispatch import SEG_TINY
    from dedark_yolo_tpu import YOLO
    if fmt == "tflite":
        pytest.importorskip("tensorflow")
    (tmp_path / "seg.yaml").write_text(yaml.safe_dump(SEG_TINY))
    m = YOLO(str(tmp_path / "seg.yaml"))
    m._ensure_params(96)
    d = _mk_imgs(tmp_path)
    kw = dict(imgsz=96, conf=0.0001, batch=2, max_nms=128, max_det=8)
    live = m.predict(str(d), **kw)
    p = m.export(format=fmt, imgsz=96, batch=2, project=str(tmp_path / fmt))
    res = YOLO(p).predict(str(d), **kw)
    for lr, br in zip(live, res):
        assert len(br.boxes) == len(lr.boxes)
        if len(lr.boxes):
            assert np.abs(br.boxes.data - lr.boxes.data).max() < 1e-4
            assert (br.masks.data == lr.masks.data).mean() > 0.999


def test_export_pose_task_roundtrip(tmp_path):
    import yaml
    from test_task_dispatch import POSE_TINY
    from dedark_yolo_tpu import YOLO
    (tmp_path / "pose.yaml").write_text(yaml.safe_dump(POSE_TINY))
    m = YOLO(str(tmp_path / "pose.yaml"))
    m._ensure_params(96)
    d = _mk_imgs(tmp_path)
    kw = dict(imgsz=96, conf=0.0001, batch=2, max_nms=128, max_det=8)
    live = m.predict(str(d), **kw)
    p = m.export(format="bin", imgsz=96, batch=2, project=str(tmp_path / "b"))
    res = YOLO(p).predict(str(d), **kw)
    for lr, br in zip(live, res):
        assert len(br.boxes) == len(lr.boxes)
        if len(lr.boxes):
            assert np.abs(br.keypoints.data - lr.keypoints.data).max() < 1e-4


def test_export_classify_task_roundtrip(tmp_path):
    import yaml
    from test_task_dispatch import CLS_TINY
    from dedark_yolo_tpu import YOLO
    (tmp_path / "cls.yaml").write_text(yaml.safe_dump(CLS_TINY))
    m = YOLO(str(tmp_path / "cls.yaml"))
    m._ensure_params(64)
    d = _mk_imgs(tmp_path)
    live = m.predict(str(d), imgsz=64, batch=2)
    p = m.export(format="bin", imgsz=64, batch=2, project=str(tmp_path / "b"))
    res = YOLO(p).predict(str(d), imgsz=64, batch=2)
    for lr, br in zip(live, res):
        np.testing.assert_allclose(np.asarray(br.probs.data),
                                   np.asarray(lr.probs.data), atol=1e-5)


def test_export_classify_val_and_segment_serving(tmp_path):
    """Classify .bin artifacts val through ClassificationValidator (metrics
    identical to live); segment .bin artifacts serve through InferenceServer
    with masks in responses (the round-2 server only accepted detect .bin)."""
    import cv2
    import yaml
    from test_task_dispatch import CLS_TINY, SEG_TINY
    from dedark_yolo_tpu import YOLO
    for split in ("train", "val"):
        for c in ("a", "b"):
            d = tmp_path / "cls" / split / c
            d.mkdir(parents=True)
            rng = np.random.default_rng(abs(hash((split, c))) % 2**31)
            for k in range(3):
                cv2.imwrite(str(d / f"{k}.jpg"),
                            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    (tmp_path / "cls.yaml").write_text(yaml.safe_dump(CLS_TINY))
    m = YOLO(str(tmp_path / "cls.yaml"))
    m._ensure_params(64)
    kw = dict(data=str(tmp_path / "cls"), imgsz=64, batch=2)
    live = m.val(**kw)
    p = m.export(format="bin", imgsz=64, batch=2, project=str(tmp_path / "b"))
    got = YOLO(p).val(**kw)
    assert abs(live["metrics/accuracy_top1"] - got["metrics/accuracy_top1"]) \
        < 1e-9

    from dedark_yolo_tpu.engine.server import InferenceServer
    (tmp_path / "seg.yaml").write_text(yaml.safe_dump(SEG_TINY))
    ms = YOLO(str(tmp_path / "seg.yaml"))
    ms._ensure_params(96)
    ps = ms.export(format="bin", imgsz=96, batch=2,
                   project=str(tmp_path / "sb"))
    srv = InferenceServer(ps, imgsz=96, max_batch=2, conf=0.0001,
                          max_det=8, max_nms=128)
    img = np.zeros((100, 140, 3), np.uint8)
    cv2.circle(img, (60, 50), 20, (60, 60, 220), -1)
    out = srv.predict(img)
    assert "masks" in out and np.asarray(out["masks"]).shape[-2:] == (100, 140)


def test_export_half_and_int8(live, tmp_path):
    """half=True exports bf16 deployment weights (~half artifact size);
    int8=True quantizes the tflite flatbuffer (reference exporter int8 flag,
    dynamic-range without data, activation-calibrated with data)."""
    from dedark_yolo_tpu.engine.autobackend import AutoBackend
    m, img, lb, ls = live
    p32 = m.export(format="bin", imgsz=96, batch=2,
                   project=str(tmp_path / "f32"))
    p16 = m.export(format="bin", imgsz=96, batch=2, half=True,
                   project=str(tmp_path / "bf16"))
    s32 = Path(p32).stat().st_size
    s16 = Path(p16).stat().st_size
    assert s16 < 0.6 * s32
    _, hs = (np.asarray(x) for x in AutoBackend(p16).forward(img))
    assert np.abs(hs - ls).max() < 5e-3  # bf16 rounding only

    pf = m.export(format="tflite", imgsz=96, batch=2,
                  project=str(tmp_path / "f"))
    pq = m.export(format="tflite", imgsz=96, batch=2, int8=True,
                  project=str(tmp_path / "q"))
    assert Path(pq).stat().st_size < 0.5 * Path(pf).stat().st_size
    _, qs = (np.asarray(x) for x in AutoBackend(pq).forward(img))
    assert np.abs(qs - ls).max() < 2e-2  # weight-quantization error bound


def test_benchmark_formats_table(live, tmp_path):
    """YOLO.benchmark(formats=True): export each deployment format and
    measure size/throughput through AutoBackend (reference benchmark(),
    utils/benchmarks.py:47-149 exports every format and vals each)."""
    m, img, lb, ls = live
    rows = m.benchmark(formats=True, imgsz=96, batch=2,
                       export_dir=str(tmp_path))
    by_fmt = {r["format"]: r for r in rows}
    assert set(by_fmt) == {"live", "bin", "tflite", "saved_model"}
    for fmt, r in by_fmt.items():
        assert "error" not in r, r
        assert r["img_per_sec"] > 0
        if fmt != "live":
            assert r["size_mb"] > 0


def test_export_onnx_guarded_error(tmp_path, monkeypatch):
    """Without tf2onnx/onnx installed the exporter raises the documented
    clear error, not a mid-convert failure (reference exporter.py:138-186)."""
    import sys

    from dedark_yolo_tpu import YOLO
    monkeypatch.setitem(sys.modules, "tf2onnx", None)  # forces ImportError
    m = YOLO(TINY)
    m._ensure_params(96)
    with pytest.raises(RuntimeError, match="tf2onnx"):
        m.export(format="onnx", imgsz=96, batch=1, project=str(tmp_path))


def test_export_onnx_call_contract_via_fake_toolchain(tmp_path, monkeypatch):
    """A fake tf2onnx pins the conversion call contract: from_function gets
    the uint8 input signature, the chosen opset, and the model.onnx output
    path; the sidecar json is written beside it."""
    import json
    import sys
    import types

    pytest.importorskip("tensorflow")
    from dedark_yolo_tpu import YOLO

    calls = {}

    def from_function(tfun, input_signature=None, opset=None,
                      output_path=None):
        calls["sig"] = input_signature
        calls["opset"] = opset
        calls["output_path"] = output_path
        Path(output_path).write_bytes(b"fake-onnx")
        return object(), None

    fake_t2o = types.ModuleType("tf2onnx")
    fake_t2o.convert = types.SimpleNamespace(from_function=from_function)
    fake_onnx = types.ModuleType("onnx")
    monkeypatch.setitem(sys.modules, "tf2onnx", fake_t2o)
    monkeypatch.setitem(sys.modules, "onnx", fake_onnx)

    m = YOLO(TINY)
    m._ensure_params(96)
    p = m.export(format="onnx", imgsz=96, batch=1, project=str(tmp_path),
                 opset=13)
    assert p.endswith("model.onnx") and Path(p).read_bytes() == b"fake-onnx"
    assert calls["opset"] == 13 and calls["output_path"] == p
    sig = calls["sig"][0]
    assert tuple(sig.shape) == (1, 96, 96, 3) and sig.dtype.name == "uint8"
    meta = json.loads(Path(p + ".json").read_text())
    assert meta["task"] == "detect" and meta["imgsz"] == 96
