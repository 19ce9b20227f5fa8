"""End-to-end engine tests on a tiny model + synthetic dataset (CPU, 8 devices)."""

from pathlib import Path

import numpy as np
import pytest

from synth import make_synth_dataset

TINY = str(Path(__file__).parent / "tiny_model.yaml")


@pytest.fixture(scope="module")
def synth_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("engineds")
    return str(make_synth_dataset(root, n_train=8, n_val=4, imgsz=128))


@pytest.fixture(scope="module")
def trained(synth_yaml, tmp_path_factory):
    from dedark_yolo_tpu import YOLO
    run_dir = tmp_path_factory.mktemp("runs")
    model = YOLO(TINY)
    # Fast-tier budget (tests/README): single-device mesh — the multi-device
    # train paths are covered by the slow tier (test_parallel.py, the 2-D
    # mesh test below); GSPMD partitioning here roughly doubles compile time
    # on the 1-core host for no extra fast-tier coverage.
    metrics = model.train(data=synth_yaml, epochs=2, imgsz=96, batch=8, mesh_shape=[1],
                          workers=2, project=str(run_dir), name="t",
                          max_boxes=16, max_nms=256, max_det=20,
                          warmup_epochs=0.5, plots=False, val=True)
    return model, metrics, run_dir / "t"


def test_train_artifacts(trained):
    model, metrics, run_dir = trained
    assert (run_dir / "weights" / "last.npz").is_file()
    assert (run_dir / "weights" / "best.npz").is_file()
    assert (run_dir / "results.csv").is_file()
    assert (run_dir / "args.yaml").is_file()
    csv_lines = (run_dir / "results.csv").read_text().strip().splitlines()
    assert len(csv_lines) == 3  # header + 2 epochs
    assert "fitness" in metrics


@pytest.mark.slow
def test_train_2d_mesh_spatial(synth_yaml, tmp_path):
    """Full user-facing training on a 2-D (data x spatial) mesh: image rows
    sharded over 'spatial' inside the differentiated train step (GSPMD halo
    exchange), batch over 'data'. imgsz must divide 32 * spatial shards."""
    from dedark_yolo_tpu import YOLO
    model = YOLO(TINY)
    metrics = model.train(data=synth_yaml, epochs=1, imgsz=64, batch=2,
                          mesh_shape=[2, 2], mesh_axes=["data", "spatial"],
                          workers=2, project=str(tmp_path), name="sp",
                          max_boxes=16, max_nms=256, max_det=20,
                          warmup_epochs=0.0, plots=False, val=True)
    assert "fitness" in metrics
    rows = (tmp_path / "sp" / "results.csv").read_text().strip().splitlines()[1:]
    assert all(np.isfinite(float(x)) for x in rows[0].split(","))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="divide 32"):
        YOLO(TINY).train(data=synth_yaml, epochs=1, imgsz=96, batch=2,
                         mesh_shape=[2, 2], mesh_axes=["data", "spatial"],
                         project=str(tmp_path), name="bad", plots=False)


def test_train_loss_finite(trained):
    _, _, run_dir = trained
    rows = (run_dir / "results.csv").read_text().strip().splitlines()[1:]
    for row in rows:
        vals = [float(x) for x in row.split(",")]
        assert all(np.isfinite(vals)), row
        assert vals[1] > 0  # box loss positive


def test_val_from_checkpoint(trained, synth_yaml):
    from dedark_yolo_tpu import YOLO
    _, _, run_dir = trained
    model = YOLO(str(run_dir / "weights" / "best.npz"))
    metrics = model.val(data=synth_yaml, imgsz=96, batch=4, workers=2,
                        max_boxes=16, max_nms=256, max_det=20, plots=False)
    assert "metrics/mAP50(B)" in metrics
    assert 0.0 <= metrics["metrics/mAP50(B)"] <= 1.0


def test_predict_and_save(trained, synth_yaml, tmp_path):
    from dedark_yolo_tpu.data import check_det_dataset
    model, _, _ = trained
    data = check_det_dataset(synth_yaml)
    img_dir = data["val"]
    results = model.predict(img_dir, imgsz=96, batch=2, conf=0.01, workers=1,
                            max_nms=256, max_det=20, save=False, save_txt=True,
                            save_crop=True, project=str(tmp_path))
    assert len(results) == 4
    r = results[0]
    assert r.orig_img.ndim == 3
    # boxes scaled into original image space
    if len(r.boxes):
        h, w = r.orig_shape
        assert (r.boxes.xyxy[:, 2] <= w + 1).all()
        assert (r.boxes.xyxy[:, 3] <= h + 1).all()
    js = r.tojson()
    assert js.startswith("[")
    # pipelined batching must preserve source order (sorted dir listing)
    import glob
    expected = sorted(glob.glob(str(Path(img_dir) / "*")))
    assert [x.path for x in results] == expected
    # save_crop: one crop per detection under crops/<class-name>/ (reference
    # results.py save_crop)
    n_dets = sum(len(x.boxes) for x in results)
    if n_dets:
        crops = list((tmp_path / "predict" / "crops").rglob("*.jpg"))
        assert len(crops) == n_dets


@pytest.mark.slow
def test_resume(trained, synth_yaml):
    from dedark_yolo_tpu import YOLO
    _, _, run_dir = trained
    model = YOLO(TINY)
    metrics = model.train(data=synth_yaml, epochs=3, imgsz=96, batch=8, mesh_shape=[2],
                          workers=2, project=str(run_dir.parent), name="t",
                          max_boxes=16, max_nms=256, max_det=20, resume=True,
                          exist_ok=True, warmup_epochs=0.5, plots=False)
    rows = (run_dir / "results.csv").read_text().strip().splitlines()[1:]
    # 2 epochs from the first run + 1 resumed epoch (epoch index 2)
    assert int(float(rows[-1].split(",")[0])) == 2


@pytest.mark.slow
def test_final_eval_reports_best(synth_yaml, tmp_path):
    """Returned train metrics are the BEST checkpoint's, not the last epoch's
    (reference final_eval vals best.pt, trainer.py:549-558). The re-val of the
    best EMA weights must reproduce the fitness recorded when best.npz was
    written."""
    from dedark_yolo_tpu import YOLO
    from dedark_yolo_tpu.utils.checkpoint import load_checkpoint
    model = YOLO(TINY)
    metrics = model.train(data=synth_yaml, epochs=3, imgsz=96, batch=8,
                          mesh_shape=[2], workers=2, project=str(tmp_path),
                          name="fe", max_boxes=16, max_nms=256, max_det=20,
                          warmup_epochs=0.5, plots=False, val=True)
    meta, _ = load_checkpoint(tmp_path / "fe" / "weights" / "best.npz")
    assert metrics["fitness"] == pytest.approx(meta["best_fitness"], abs=1e-5)


@pytest.mark.slow
def test_sigterm_graceful_stop(synth_yaml, tmp_path):
    """SIGTERM mid-training finishes the epoch, checkpoints, and stops cleanly
    with a resumable last.npz (preemption handling; no reference counterpart)."""
    import os
    import signal
    from dedark_yolo_tpu.engine.trainer import DetectionTrainer

    trainer = DetectionTrainer(dict(
        model=TINY, data=synth_yaml, epochs=50, imgsz=96, batch=8,
        mesh_shape=[2], workers=2, project=str(tmp_path), name="sig",
        max_boxes=16, max_nms=256, max_det=20, warmup_epochs=0.5, plots=False,
        val=False, mode="train"))
    # deliver SIGTERM mid-run, after the trainer's handler is installed
    trainer.callbacks["on_train_epoch_end"].append(
        lambda t: os.kill(os.getpid(), signal.SIGTERM)
        if t.epoch == 1 else None)   # fires mid-run, after handler install
    trainer.train()
    run = tmp_path / "sig"
    rows = (run / "results.csv").read_text().strip().splitlines()[1:]
    assert len(rows) == 2               # stopped cleanly after epoch 2 of 50
    assert (run / "weights" / "last.npz").is_file()
    # handler restored: SIGTERM is no longer swallowed by our hook
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.SIG_IGN,
                                                signal.default_int_handler)


def test_export_stablehlo(trained, tmp_path):
    model, _, _ = trained
    path = model.export(format="stablehlo", imgsz=96, batch=1,
                        project=str(tmp_path))
    text = Path(path).read_text()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text


def test_predict_video(trained, tmp_path):
    """Video source: frames stream through the same fused graph, annotated mp4 muxed."""
    import cv2
    model, _, _ = trained
    vid = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    w.release()
    results = model.predict(str(vid), imgsz=96, batch=2, conf=0.5, vid_stride=2,
                            max_nms=256, max_det=20, save=True,
                            project=str(tmp_path / "out"))
    assert len(results) == 3  # 6 frames / stride 2
    out = list((tmp_path / "out" / "predict").glob("*_pred.mp4"))
    assert len(out) == 1
    cap = cv2.VideoCapture(str(out[0]))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()


def test_predict_save_enhanced(trained, synth_yaml, tmp_path):
    """save_enhanced captures the lowlight_recovery output in the SAME graph
    (no second forward) and writes it device-encoded."""
    from dedark_yolo_tpu.data import check_det_dataset
    model, _, _ = trained
    data = check_det_dataset(synth_yaml)
    results = model.predict(data["val"], imgsz=96, batch=2, conf=0.5, workers=1,
                            max_nms=256, max_det=20, save=False, save_txt=False,
                            save_enhanced=True, project=str(tmp_path))
    r = results[0]
    assert r.enhanced_img is not None
    assert r.enhanced_img.shape == (96, 96, 3)
    assert np.isfinite(r.enhanced_img).all()
    enh = sorted((tmp_path / "predict").glob("*_enhanced.jpg"))
    assert len(enh) == 4


@pytest.mark.slow
def test_export_bin_and_autobackend(trained, tmp_path):
    """jax.export round trip: exported .bin loads in AutoBackend and matches the
    live model's decode."""
    from dedark_yolo_tpu.engine.autobackend import AutoBackend
    model, _, run_dir = trained
    path = model.export(format="export", imgsz=96, batch=1, project=str(tmp_path))
    assert Path(path).stat().st_size > 1000
    backend = AutoBackend(path, imgsz=96, batch=1).warmup()
    img = np.random.default_rng(0).integers(0, 255, (1, 96, 96, 3), dtype=np.uint8)
    b1, s1 = backend.forward(img)
    # compare against the same in-memory model the export came from
    # (test_resume overwrites best.npz on disk, so don't reload from there)
    import jax.numpy as jnp
    v = {"params": model.params, "batch_stats": model.batch_stats}
    b2, s2 = model.model.apply_eval(v, jnp.asarray(img).astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_val_and_predict_exported_artifact(trained, synth_yaml, tmp_path):
    """YOLO('model.bin') routes val/predict through AutoBackend (reference
    standalone modes wrap AutoBackend, validator.py:116-123) and matches the
    live model's mAP; batch 3 over 4 val images exercises last-batch padding."""
    from dedark_yolo_tpu import YOLO
    from dedark_yolo_tpu.data import check_det_dataset
    model, _, _ = trained
    path = model.export(format="export", imgsz=96, batch=3,
                        project=str(tmp_path))

    bm = YOLO(path)
    common = dict(data=synth_yaml, imgsz=96, max_boxes=16, max_nms=256,
                  max_det=20, plots=False, workers=1)
    m_bin = bm.val(batch=3, **common)
    m_live = model.val(batch=3, rect=False, **common)
    assert m_bin["metrics/mAP50(B)"] == pytest.approx(
        m_live["metrics/mAP50(B)"], abs=2e-3)

    img_dir = check_det_dataset(synth_yaml)["val"]
    results = bm.predict(img_dir, conf=0.01, max_nms=256, max_det=20,
                         save=False)
    assert len(results) == 4
    assert results[0].boxes.data.shape[1] == 6


@pytest.mark.slow
def test_rect_val(trained, synth_yaml):
    """rect=True buckets val images by aspect into static shapes; metrics stay
    consistent with square val."""
    from dedark_yolo_tpu import YOLO
    _, _, run_dir = trained
    model = YOLO(str(run_dir / "weights" / "best.npz"))
    m_sq = model.val(data=synth_yaml, imgsz=96, batch=4, workers=2, rect=False,
                     max_boxes=16, max_nms=256, max_det=20, plots=False)
    m_rc = model.val(data=synth_yaml, imgsz=96, batch=4, workers=2, rect=True,
                     max_boxes=16, max_nms=256, max_det=20, plots=False)
    assert "metrics/mAP50(B)" in m_rc
    # same data, slightly different resampling: results in the same ballpark
    assert abs(m_rc["metrics/mAP50(B)"] - m_sq["metrics/mAP50(B)"]) < 0.5


def test_ensemble_load(trained):
    """List-of-checkpoints spec averages parameters (Ensemble equivalent)."""
    from dedark_yolo_tpu import YOLO
    import jax
    _, _, run_dir = trained
    last = str(run_dir / "weights" / "last.npz")
    best = str(run_dir / "weights" / "best.npz")
    single = YOLO(best)
    ens = YOLO([best, last])
    l1 = jax.tree_util.tree_leaves(single.params)
    l2 = jax.tree_util.tree_leaves(ens.params)
    assert len(l1) == len(l2)
    assert all(a.shape == np.asarray(b).shape for a, b in zip(l1, l2))


@pytest.mark.slow
def test_track_end_to_end(trained, tmp_path):
    """model.track(): detection on-device through the predictor stream,
    ByteTrack association on host, ids stamped into a 7th box column, and
    save/save_txt written AFTER tracking so artifacts carry the ids
    (reference engine/model.py:229-250 — its trackers package is missing;
    ours runs). Identity-persistence logic itself is unit-tested with exact
    detections in test_trackers.py; here the 2-epoch tiny model's outputs
    are noise, so the assertions target the plumbing.

    persist=True: a directory of stills is an image SEQUENCE only if the
    caller says so (each still is otherwise its own source and the tracker
    resets per image, like new-video resets)."""
    import cv2
    from synth import CLASS_COLORS
    model, _, _ = trained
    seq = tmp_path / "seq"
    seq.mkdir()
    rng = np.random.default_rng(3)
    for f in range(6):
        img = rng.integers(90, 140, (96, 128, 3), dtype=np.uint8)
        x1 = 10 + 8 * f
        cv2.rectangle(img, (x1, 30), (x1 + 36, 70), CLASS_COLORS[0], -1)
        cv2.imwrite(str(seq / f"frame_{f:03d}.jpg"), img)
    # thresholds sized to the untrained-model confidence floor (~0.004),
    # via a custom tracker yaml (exercises path-based cfg loading too)
    tcfg = tmp_path / "lowconf_bytetrack.yaml"
    tcfg.write_text(
        "tracker_type: bytetrack\ntrack_high_thresh: 0.003\n"
        "track_low_thresh: 0.0005\nnew_track_thresh: 0.003\n"
        "track_buffer: 30\nmatch_thresh: 0.95\n")
    results = model.track(str(seq), imgsz=96, batch=2, conf=0.001,
                          persist=True, tracker=str(tcfg),
                          max_nms=256, max_det=20, save=True, save_txt=True,
                          project=str(tmp_path / "out"))
    assert len(results) == 6
    with_boxes = [r for r in results if len(r.boxes)]
    assert with_boxes, "no detections at the noise-floor threshold"
    for r in with_boxes:
        assert r.boxes.is_track
        assert r.boxes.id.min() >= 1
        assert np.allclose(r.boxes.id, np.round(r.boxes.id))
    # ids persist across frames of the sequence (persist=True suppressed the
    # per-still reset): some id seen on an earlier frame recurs later
    per_frame = [set(map(int, r.boxes.id)) for r in with_boxes]
    assert any(a & b for a, b in zip(per_frame, per_frame[1:]))
    # save landed post-tracking: txt rows end with the integer track id
    txts = sorted((tmp_path / "out" / "predict" / "labels").glob("*.txt"))
    assert len(txts) == 6
    rows = [ln.split() for t in txts for ln in t.read_text().splitlines()]
    assert rows and all(len(r) == 6 and float(r[-1]).is_integer()
                        for r in rows)
    assert len(list((tmp_path / "out" / "predict").glob("*.jpg"))) == 6


@pytest.mark.slow
def test_track_without_persist_resets_per_still(trained, tmp_path):
    """Default persist=False: each still image in a directory is its own
    source, so ids restart at 1 per frame and no cross-image association
    happens (new tracker per .track() call as well)."""
    import cv2
    from synth import CLASS_COLORS
    model, _, _ = trained
    seq = tmp_path / "seq"
    seq.mkdir()
    rng = np.random.default_rng(4)
    for f in range(2):
        img = rng.integers(90, 140, (96, 128, 3), dtype=np.uint8)
        cv2.rectangle(img, (40, 30), (76, 70), CLASS_COLORS[1], -1)
        cv2.imwrite(str(seq / f"frame_{f:03d}.jpg"), img)
    tcfg = tmp_path / "t.yaml"
    tcfg.write_text(
        "tracker_type: bytetrack\ntrack_high_thresh: 0.003\n"
        "track_low_thresh: 0.0005\nnew_track_thresh: 0.003\n"
        "track_buffer: 30\nmatch_thresh: 0.95\n")
    results = model.track(str(seq), imgsz=96, batch=2, conf=0.001,
                          tracker=str(tcfg), max_nms=256, max_det=20)
    with_boxes = [r for r in results if len(r.boxes)]
    # every tracked frame's id space starts at 1 (reset between stills)
    for r in with_boxes:
        assert int(r.boxes.id.min()) == 1


@pytest.mark.slow
def test_track_video_muxes_mp4_and_crops(trained, tmp_path):
    """track(save=True) on a VIDEO source muxes ONE annotated mp4 (not a jpg
    per frame); save_crop/save_conf survive the post-tracking save path."""
    import cv2
    from synth import CLASS_COLORS
    model, _, _ = trained
    vid = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (128, 96))
    rng = np.random.default_rng(5)
    for f in range(6):
        img = rng.integers(90, 140, (96, 128, 3), dtype=np.uint8)
        cv2.rectangle(img, (10 + 8 * f, 30), (46 + 8 * f, 70),
                      CLASS_COLORS[0], -1)
        w.write(img)
    w.release()
    tcfg = tmp_path / "t.yaml"
    tcfg.write_text(
        "tracker_type: bytetrack\ntrack_high_thresh: 0.003\n"
        "track_low_thresh: 0.0005\nnew_track_thresh: 0.003\n"
        "track_buffer: 30\nmatch_thresh: 0.95\n")
    results = model.track(str(vid), imgsz=96, batch=2, conf=0.001,
                          tracker=str(tcfg), max_nms=256, max_det=20,
                          save=True, save_txt=True, save_conf=True,
                          save_crop=True, project=str(tmp_path / "out"))
    assert len(results) == 6
    out_dir = tmp_path / "out" / "predict"
    vids = list(out_dir.glob("*_track.mp4"))
    assert len(vids) == 1 and not list(out_dir.glob("*.jpg"))
    cap = cv2.VideoCapture(str(vids[0]))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()
    n_dets = sum(len(r.boxes) for r in results)
    if n_dets:
        # save_conf=True: id is the 7th token after the conf column
        rows = [ln.split() for t in (out_dir / "labels").glob("*.txt")
                for ln in t.read_text().splitlines()]
        assert rows and all(len(r) == 7 for r in rows)
        assert len(list((out_dir / "crops").rglob("*.jpg"))) == n_dets


def test_ckpt_period_throttles_last(synth_yaml, tmp_path, monkeypatch):
    """ckpt_period>1 skips the full-state last.npz gather on intermediate
    epochs but always writes on the final epoch, and the throttled run still
    leaves a resumable last.npz (VERDICT r4 #3: the per-epoch 768 MB gather
    competes with the train loop on thin-tunnel hosts; reference saves every
    epoch, trainer.py:366-380 — here that cost is a knob)."""
    from dedark_yolo_tpu import YOLO
    from dedark_yolo_tpu.engine import trainer as trainer_mod
    from dedark_yolo_tpu.utils.checkpoint import load_checkpoint

    writes = []
    orig = trainer_mod.BaseTrainer._ckpt_async

    def spy(self, path, kwargs):
        writes.append(Path(path).name)
        return orig(self, path, kwargs)

    monkeypatch.setattr(trainer_mod.BaseTrainer, "_ckpt_async", spy)
    model = YOLO(TINY)
    model.train(data=synth_yaml, epochs=4, imgsz=96, batch=8, mesh_shape=[1],
                workers=2, project=str(tmp_path), name="ck", max_boxes=16,
                max_nms=256, max_det=20, warmup_epochs=0, plots=False,
                val=False, ckpt_period=3)
    # due epochs: 3 (period) and 4 (final) -> exactly 2 last.npz writes
    assert writes.count("last.npz") == 2, writes
    last = tmp_path / "ck" / "weights" / "last.npz"
    meta, flat = load_checkpoint(last)
    assert meta["epoch"] == 3  # 0-based final epoch
    # full resume state present on disk (optimizer leaves, not just params)
    assert any(k.startswith("opt_state") for k in flat)


def test_epoch_end_hook_precedes_stop_decision(synth_yaml, tmp_path):
    """A preemption flag raised inside on_fit_epoch_end (the same flag the
    SIGTERM handler sets) must stop THIS epoch with this epoch's last.npz —
    the ckpt_period reorder once deferred the check past the callbacks and
    trained a free extra epoch (caught by test_two_process_resume). Also
    pins the reference hook order: on_fit_epoch_end before the checkpoint
    write, on_model_save after it (reference trainer.py:384-396)."""
    from dedark_yolo_tpu import YOLO
    from dedark_yolo_tpu.utils.checkpoint import load_checkpoint

    model = YOLO(TINY)
    events = []
    model.add_callback("on_fit_epoch_end",
                       lambda t: events.append(("fit_epoch_end", t.epoch)))
    model.add_callback("on_fit_epoch_end",
                       lambda t: setattr(t, "_interrupted", True))
    model.add_callback("on_model_save",
                       lambda t: events.append(("model_save", t.epoch)))
    model.train(data=synth_yaml, epochs=3, imgsz=96, batch=8, mesh_shape=[1],
                workers=2, project=str(tmp_path), name="hook", max_boxes=16,
                max_nms=256, max_det=20, warmup_epochs=0, plots=False,
                val=False)
    # stopped after epoch 0, checkpoint reflects epoch 0, hook order correct
    assert events == [("fit_epoch_end", 0), ("model_save", 0)], events
    meta, _ = load_checkpoint(tmp_path / "hook" / "weights" / "last.npz")
    assert meta["epoch"] == 0
