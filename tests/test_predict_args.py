"""Prediction/validation arg parity: plot args (boxes/show_conf/show_labels +
deprecated hide_* shims), save_hybrid autolabelling, val save_txt, and
retina_masks (reference cfg keys wired at predictor.py:199-203,
detect/val.py:38-39/114-116/212-219, segment/predict.py:34-36)."""

from pathlib import Path

import numpy as np
import pytest
import yaml

from dedark_yolo_tpu.cfg import get_cfg, DEFAULT_CFG_DICT
from dedark_yolo_tpu.engine.results import Results

TINY = str(Path(__file__).parent / "tiny_model.yaml")


def _result():
    img = np.full((80, 100, 3), 120, np.uint8)
    boxes = np.asarray([[10, 10, 60, 50, 0.9, 0]], np.float32)
    return Results(orig_img=img, path="x.jpg", names={0: "thing"}, boxes=boxes)


def test_plot_args_change_output():
    r = _result()
    base = r.plot()
    no_boxes = r.plot(boxes=False)
    no_labels = r.plot(labels=False)
    no_conf = r.plot(conf=False)
    # boxes=False leaves the image untouched
    np.testing.assert_array_equal(no_boxes, r.orig_img)
    assert (base != no_boxes).any()
    # label text area differs when labels/conf are suppressed
    assert (base != no_labels).any()
    assert (base != no_conf).any()
    assert (no_labels != no_conf).any()


def test_plot_deprecated_kwargs_shim():
    r = _result()
    np.testing.assert_array_equal(r.plot(conf=False), r.plot(show_conf=False))
    np.testing.assert_array_equal(r.plot(boxes=False), r.plot(show_boxes=False))
    np.testing.assert_array_equal(r.plot(line_width=3),
                                  r.plot(line_thickness=3))


def test_cfg_hide_deprecations():
    a = get_cfg(DEFAULT_CFG_DICT, {"hide_labels": "False"})
    assert a.show_labels is True
    a = get_cfg(DEFAULT_CFG_DICT, {"hide_labels": True})
    assert a.show_labels is False
    a = get_cfg(DEFAULT_CFG_DICT, {"hide_conf": "True"})
    assert a.show_conf is False
    a = get_cfg(DEFAULT_CFG_DICT, {"line_thickness": 4})
    assert a.line_width == 4


@pytest.mark.slow
def test_save_hybrid_autolabelling(tmp_path):
    """save_hybrid injects GT as conf-1.0 candidates: even an untrained model
    scores ~perfect mAP50 (the labels ARE detections), and save_txt writes
    the hybrid label files (reference autolabelling flow)."""
    import jax
    from synth import make_synth_dataset
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.engine.validator import DetectionValidator

    yaml_path = make_synth_dataset(tmp_path / "ds", n_train=4, n_val=4)
    d = model_yaml_load(TINY)
    model = DetectionModel(d, nc=3)
    v = model.init(jax.random.PRNGKey(0), imgsz=96)
    args = get_cfg(DEFAULT_CFG_DICT, {
        "data": str(yaml_path), "imgsz": 96, "batch": 4, "max_boxes": 16,
        "max_nms": 128, "max_det": 20, "rect": False, "plots": False,
        "save_hybrid": True, "save_txt": True, "save_conf": True,
        "workers": 0, "verbose": False})
    validator = DetectionValidator(args=args, save_dir=tmp_path / "val")
    metrics = validator(model=model, params=v["params"],
                        batch_stats=v["batch_stats"])
    assert metrics["metrics/mAP50(B)"] > 0.9
    txts = sorted((tmp_path / "val" / "labels").glob("*.txt"))
    assert len(txts) == 4
    first = txts[0].read_text().strip().splitlines()
    assert len(first) >= 1
    vals = first[0].split()
    assert len(vals) == 6  # cls x y w h conf (save_conf=True)
    assert all(0.0 <= float(x) <= 1.0 for x in vals[1:5])


@pytest.mark.slow
def test_retina_masks_predict(tmp_path):
    """retina_masks=True produces native-resolution masks from upsampled
    probabilities; both modes yield (n, H0, W0) boolean masks."""
    import cv2
    from test_segment_task import SEG_TINY
    from dedark_yolo_tpu import YOLO

    yaml_path = tmp_path / "seg_tiny.yaml"
    yaml_path.write_text(yaml.safe_dump(SEG_TINY))
    src = tmp_path / "imgs"
    src.mkdir()
    img = np.full((100, 120, 3), 110, np.uint8)
    cv2.circle(img, (60, 50), 25, (220, 60, 60), -1)
    cv2.imwrite(str(src / "a.jpg"), img)

    for retina in (False, True):
        m = YOLO(str(yaml_path))
        res = m.predict(str(src), imgsz=96, conf=0.0, max_det=5, max_nms=64,
                        retina_masks=retina, save=False)
        assert len(res) == 1
        r = res[0]
        if r.masks is not None and len(r.masks):
            assert r.masks.data.shape[1:] == (100, 120)
            assert r.masks.data.dtype == bool
