"""perform.py — the L7 user-facing driver surface (reference perform.py:19-621).

One tiny end-to-end pass over the driver functions the reference exposes:
train -> predict (metric battery) -> test_img -> test_folders (FPS json) ->
calculate_detection_metrics (rates report) -> flops_params.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import perform  # noqa: E402
from synth import make_synth_dataset  # noqa: E402

TINY = str(Path(__file__).parent / "tiny_model.yaml")
KW = dict(max_boxes=16, max_nms=256, max_det=20, plots=False, workers=1)


@pytest.fixture(scope="module")
def driver_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("performds")
    yaml_path = str(make_synth_dataset(root, n_train=8, n_val=4, imgsz=128))
    out = tmp_path_factory.mktemp("performruns")
    perform.train(model_yaml=TINY, data=yaml_path, epochs=1, imgsz=96,
                  batch=8, project=str(out), name="t", mesh_shape=[2], **KW)
    return yaml_path, str(out / "t" / "weights" / "best.npz"), out


def test_predict_metric_battery(driver_run):
    data, weights, _ = driver_run
    metrics = perform.predict(weights, data, imgsz=96, batch=4, **KW)
    # the fork's extras ride along: mAP50/75, per-class f1s, mf1
    # (reference perform.py:557-592)
    for k in ("metrics/mAP50(B)", "metrics/mAP50-95(B)"):
        assert k in metrics


def test_img_and_folders(driver_run, tmp_path):
    data, weights, _ = driver_run
    import cv2
    from dedark_yolo_tpu.data import check_det_dataset
    img_dir = Path(check_det_dataset(data)["val"])
    one = sorted(img_dir.glob("*.jpg"))[0]
    res = perform.test_img(weights, str(one), imgsz=96, conf=0.01,
                           save_dir=str(tmp_path / "ti"))
    assert res[0].orig_img.ndim == 3
    stats = perform.test_folders(weights, str(img_dir), imgsz=96, conf=0.01,
                                 batch=4, save_dir=str(tmp_path / "tf"))
    assert stats["images"] == 4 and stats["fps"] > 0
    assert json.loads((tmp_path / "tf" / "detection_stats.json").read_text())


def test_rates_and_flops(driver_run, tmp_path):
    data, weights, _ = driver_run
    report = perform.calculate_detection_metrics(
        weights, data, imgsz=96, batch=4, save_dir=str(tmp_path / "rates"),
        max_boxes=16, max_nms=256, max_det=20)
    assert len(report) == 3
    for v in report.values():
        assert 0.0 <= v["detection_rate"] <= 1.0
        assert v["detection_rate"] + v["miss_rate"] == pytest.approx(1.0)
    n_params, flops = perform.flops_params(weights, imgsz=96)
    assert n_params > 1e5


def test_video_mode(driver_run, tmp_path):
    """perform.test_video: annotated video with FPS overlay (reference
    perform.py:72-106)."""
    import cv2
    data, weights, _ = driver_run
    src = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (128, 96))
    rng = np.random.default_rng(0)
    for _ in range(4):
        w.write(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    w.release()
    out = perform.test_video(weights, str(src), imgsz=96, conf=0.01,
                             output=str(tmp_path / "out.mp4"), **{
                                 k: v for k, v in KW.items()
                                 if k in ()})
    assert out is not None and Path(out).exists()
    cap = cv2.VideoCapture(str(out))
    assert cap.isOpened() and cap.get(cv2.CAP_PROP_FRAME_COUNT) == 4
    cap.release()
