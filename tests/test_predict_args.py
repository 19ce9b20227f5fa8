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

    # a SECOND val pass over the same save_dir (per-epoch val during
    # training reuses it) must overwrite, not append duplicate rows
    DetectionValidator(args=args, save_dir=tmp_path / "val")(
        model=model, params=v["params"], batch_stats=v["batch_stats"])
    assert txts[0].read_text().strip().splitlines() == first


def test_results_api_surface():
    """Reference Results API: keys/new/__getitem__/update/verbose + the
    BaseTensor device-move shims (results.py:41-164, 258-273)."""
    img = np.full((80, 100, 3), 120, np.uint8)
    boxes = np.asarray([[10, 10, 60, 50, 0.9, 0],
                        [20, 20, 70, 60, 0.8, 1],
                        [30, 30, 80, 70, 0.7, 1]], np.float32)
    r = Results(orig_img=img, path="x.jpg", names={0: "cat", 1: "dog"},
                boxes=boxes)
    assert r.keys == ["boxes"]
    assert len(r.new()) == 0
    sub = r[:2]
    assert len(sub) == 2 and sub.path == "x.jpg"
    assert r.verbose() == "1 cat, 2 dogs, "
    assert r.new().verbose() == "(no detections), "
    r2 = r.new()
    r2.update(boxes=boxes[:1])
    assert len(r2) == 1
    # device-move shims are identity on host numpy
    assert r.boxes.cpu() is r.boxes.numpy() is r.boxes.to("x") is r.boxes
    assert r.boxes.shape == (3, 6)
    np.testing.assert_array_equal(r.boxes[1].data, boxes[1:2])
    with pytest.raises(NotImplementedError):
        r.boxes.cuda()
    r.pandas()  # warn-stub like the reference


def test_masks_xyn_and_segments_alias():
    from dedark_yolo_tpu.engine.results_extra import Masks
    m = np.zeros((1, 8, 8), bool)
    m[0, 2:6, 2:6] = True
    masks = Masks(m, (80, 100))
    xy = masks.xy[0]
    xyn = masks.xyn[0]
    assert xy.shape[1] == 2 and len(xy) == len(xyn)
    assert xyn[:, 0].max() <= 1.0 and xyn[:, 1].max() <= 1.0
    np.testing.assert_allclose(masks.segments[0], xyn)


def test_check_imshow_headless():
    from dedark_yolo_tpu.utils.checks import check_imshow
    assert check_imshow(warn=False) in (True, False)  # must not raise


@pytest.mark.slow
def test_warm_start_finetune(tmp_path):
    """Fine-tuning flows (reference model.py:348-350 + cfg/__init__.py:397):
    YOLO('ckpt.npz').train() and pretrained=<path> overlay checkpoint weights
    by path+shape intersection; a different nc transfers everything except
    the mismatched head leaves."""
    import jax
    from synth import make_synth_dataset
    from dedark_yolo_tpu import YOLO

    yaml_path = make_synth_dataset(tmp_path / "ds", n_train=8, n_val=4)
    # nbs=batch so the single epoch (2 micro-batches) actually APPLIES
    # optimizer steps — at the default nbs=64, accumulate=16 never fires and
    # the "trained" checkpoint would still equal the PRNGKey(0) init
    common = dict(data=str(yaml_path), epochs=1, imgsz=64, batch=4, nbs=4,
                  max_boxes=16, max_nms=128, max_det=10, plots=False,
                  val=False, workers=0, warmup_epochs=0.0)
    m = YOLO(TINY)
    fired = []
    m.add_callback("on_train_epoch_end", lambda tr: fired.append(tr.epoch))
    m.train(project=str(tmp_path), name="base", **common)
    assert fired == [0]  # user callback rode the trainer bus
    best = tmp_path / "base" / "weights" / "best.npz"
    ckpt = best if best.is_file() else tmp_path / "base" / "weights" / "last.npz"

    # same architecture: every leaf transfers
    m2 = YOLO(str(ckpt))
    m2.train(project=str(tmp_path), name="ft", **common)
    n, total = m2.trainer.transferred
    assert n == total > 0

    # pretrained path arg with a DIFFERENT head (nc=3 ckpt -> nc override
    # comes from data, so force a head mismatch via single_cls dataset nc=1
    # is not available here; instead train a 2-class variant)
    import yaml as _yaml
    d2 = _yaml.safe_load(Path(TINY).read_text())
    two = tmp_path / "two.yaml"
    two.write_text(_yaml.safe_dump(d2))
    data2 = _yaml.safe_load(Path(yaml_path).read_text())
    data2["nc"] = 5
    data2["names"] = {i: str(i) for i in range(5)}
    yp2 = tmp_path / "data5.yaml"
    yp2.write_text(_yaml.safe_dump(data2))
    m3 = YOLO(str(two))
    m3.train(project=str(tmp_path), name="ft5", pretrained=str(ckpt),
             **{**common, "data": str(yp2)})
    n3, total3 = m3.trainer.transferred
    assert 0 < n3 < total3  # head cls leaves skipped, backbone transferred

    # facade .load(): intersect transfer into a live model, and
    # .reset_weights(): fresh init wipes the transfer
    m4 = YOLO(TINY)
    m4.overrides["imgsz"] = 64
    m4.load(str(ckpt))
    import jax.tree_util as jtu
    loaded = [np.asarray(x).copy() for x in jtu.tree_leaves(m4.params)]
    m4.reset_weights()
    fresh = [np.asarray(x) for x in jtu.tree_leaves(m4.params)]
    src = YOLO(str(ckpt))
    for a, b in zip(loaded, jtu.tree_leaves(src.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # SOME leaf must differ after re-init (zero-init biases legitimately
    # match, so compare the whole tree, not leaf 0)
    assert any((f != l).any() for f, l in zip(fresh, loaded))
    assert m4.device  # property resolves
    assert m4.transforms is None


@pytest.mark.slow
def test_predict_show_headless_no_crash(tmp_path):
    """show=True on a headless host warns, disables, and still streams."""
    import cv2
    from dedark_yolo_tpu import YOLO
    src = tmp_path / "imgs"
    src.mkdir()
    cv2.imwrite(str(src / "a.jpg"),
                np.full((64, 64, 3), 100, np.uint8))
    m = YOLO(TINY)
    res = m.predict(str(src), imgsz=64, conf=0.0, max_det=5, max_nms=64,
                    show=True, save=False)
    assert len(res) == 1


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


def test_warm_start_pairs_ema_with_ema_bs(tmp_path):
    """_warm_start must overlay EMA weights together with EMA batch_stats
    (ema_bs), never with the raw batch_stats section — mirroring
    YOLO._load_checkpoint and trainer resume."""
    from types import SimpleNamespace
    from dedark_yolo_tpu.engine.trainer import BaseTrainer
    from dedark_yolo_tpu.utils.checkpoint import save_checkpoint

    raw_p = {"conv": {"kernel": np.full((2, 2), 1.0, np.float32)}}
    raw_bs = {"bn": {"mean": np.full((3,), 10.0, np.float32)}}
    ema_p = {"conv": {"kernel": np.full((2, 2), 2.0, np.float32)}}
    ema_bs = {"bn": {"mean": np.full((3,), 20.0, np.float32)}}
    ckpt = tmp_path / "ck.npz"
    save_checkpoint(ckpt, params=raw_p, batch_stats=raw_bs,
                    ema_params=ema_p, ema_batch_stats=ema_bs)

    stub = BaseTrainer.__new__(BaseTrainer)
    stub.args = SimpleNamespace(resume=False, pretrained=str(ckpt))
    stub.init_state = None
    dst_p = {"conv": {"kernel": np.zeros((2, 2), np.float32)}}
    dst_bs = {"bn": {"mean": np.zeros((3,), np.float32)}}
    out_p, out_bs = BaseTrainer._warm_start(stub, dst_p, dst_bs)
    np.testing.assert_array_equal(out_p["conv"]["kernel"], 2.0)
    np.testing.assert_array_equal(out_bs["bn"]["mean"], 20.0)  # ema_bs

    # checkpoint WITHOUT ema sections falls back to raw params/batch_stats
    ckpt2 = tmp_path / "ck2.npz"
    save_checkpoint(ckpt2, params=raw_p, batch_stats=raw_bs)
    stub2 = BaseTrainer.__new__(BaseTrainer)
    stub2.args = SimpleNamespace(resume=False, pretrained=str(ckpt2))
    stub2.init_state = None
    out_p, out_bs = BaseTrainer._warm_start(stub2, dst_p, dst_bs)
    np.testing.assert_array_equal(out_p["conv"]["kernel"], 1.0)
    np.testing.assert_array_equal(out_bs["bn"]["mean"], 10.0)


def test_tune_pops_checkpoint_data_override(monkeypatch, tmp_path):
    """tune(data=...) on a model whose overrides carry 'data' (checkpoint
    train_args) must not pass data twice to run_tune."""
    from dedark_yolo_tpu import YOLO
    import dedark_yolo_tpu.utils.tuner as tuner_mod

    calls = {}

    def fake_run_tune(model_yaml, data, **kw):
        calls["data"] = data
        calls["kw"] = kw
        return {}, []

    monkeypatch.setattr(tuner_mod, "run_tune", fake_run_tune)
    m = YOLO(TINY)
    m.overrides["data"] = "stale_from_ckpt.yaml"
    m.tune(data="fresh.yaml", epochs=1)
    assert calls["data"] == "fresh.yaml"
    assert "data" not in calls["kw"]


def test_device_property_honors_to():
    """YOLO.device reflects a .to(device)/device= override (reference
    model.py:389-392 reports where the model actually runs)."""
    from dedark_yolo_tpu import YOLO
    m = YOLO(TINY).to("cpu")
    assert "cpu" in m.device.lower()


def test_matmul_precision_key_and_wrap():
    """The matmul_precision serving knob (VERDICT r4 #6): the cfg key exists,
    'default' is a no-op passthrough, and wrapping makes traced dots carry
    Precision.HIGHEST (fp32-accurate MXU passes on TPU)."""
    import jax
    import jax.numpy as jnp
    from dedark_yolo_tpu.utils import matmul_precision_wrap

    assert DEFAULT_CFG_DICT.get("matmul_precision") == "default"

    def f(x):
        return jnp.dot(x, x)

    fn = lambda x: jax.make_jaxpr(f)(x)
    assert matmul_precision_wrap(fn, "default") is fn
    assert matmul_precision_wrap(fn, None) is fn
    x = jnp.ones((4, 4), jnp.float32)
    assert "HIGHEST" not in str(fn(x))
    for name in ("float32", "highest"):
        wrapped = matmul_precision_wrap(fn, name)
        assert "HIGHEST" in str(wrapped(x))
    # the predictor threads the cfg key through to its step factory
    cfg = get_cfg(overrides={"matmul_precision": "float32"})
    assert cfg.matmul_precision == "float32"
