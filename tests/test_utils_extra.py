"""Downloads, dataset-stats, and tracker-integration tests.

file:// URLs exercise the full safe_download path offline (reference
downloads.py:124-206); the tracker test injects a fake wandb module to prove
the import-guard + hook-registration pattern the reference uses for its nine
integrations (callbacks/base.py:191-212).
"""

import json
import sys
import types
import zipfile
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from synth import make_synth_dataset


def test_is_url():
    from dedark_yolo_tpu.utils.downloads import is_url
    assert is_url("https://example.com/x.zip")
    assert is_url("file:///tmp/x.txt")
    assert not is_url("not a url")
    assert not is_url("/plain/path.txt")


def test_safe_download_file_url(tmp_path):
    from dedark_yolo_tpu.utils.downloads import safe_download
    src = tmp_path / "weights.npz"
    src.write_bytes(b"\x93NUMPY-fake-payload")
    out = safe_download(src.as_uri(), dir=tmp_path / "dst")
    assert out.read_bytes() == src.read_bytes()
    # idempotent: existing file short-circuits
    assert safe_download(src.as_uri(), dir=tmp_path / "dst") == out


def test_safe_download_unzips(tmp_path):
    from dedark_yolo_tpu.utils.downloads import safe_download
    payload = tmp_path / "data"
    (payload / "sub").mkdir(parents=True)
    (payload / "sub" / "a.txt").write_text("hello")
    z = tmp_path / "data.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(payload / "sub" / "a.txt", "data/sub/a.txt")
    out = safe_download(z.as_uri(), dir=tmp_path / "dl", unzip=True)
    assert (Path(out) / "sub" / "a.txt").read_text() == "hello"


def test_safe_download_retries_then_raises(tmp_path):
    from dedark_yolo_tpu.utils.downloads import safe_download
    with pytest.raises(ConnectionError, match="failed to download"):
        safe_download("file:///nonexistent/void.bin", dir=tmp_path, retry=1)


def test_attempt_download_asset_local_wins(tmp_path):
    from dedark_yolo_tpu.utils.downloads import attempt_download_asset
    f = tmp_path / "model.npz"
    f.write_bytes(b"x")
    assert attempt_download_asset(f) == str(f)


def test_dataset_stats_schema(tmp_path):
    from dedark_yolo_tpu.data.stats import DatasetStats, zip_directory
    yp = make_synth_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=96, nc=3)
    stats = DatasetStats(yp).get_json(save=True)
    assert stats["nc"] == 3 and len(stats["names"]) == 3
    for split, n in (("train", 4), ("val", 2)):
        s = stats[split]
        assert s["image_stats"]["total"] == n
        assert len(s["instance_stats"]["per_class"]) == 3
        assert s["instance_stats"]["total"] == sum(s["instance_stats"]["per_class"])
        assert len(s["labels"]) == n
        # every label row is [int cls, 4-decimal floats...]
        rows = next(iter(s["labels"][0].values()))
        assert all(isinstance(r[0], int) and len(r) == 5 for r in rows)
    assert stats["test"] is None
    hub = Path(str(tmp_path / "ds") + "-hub")
    assert json.loads((hub / "stats.json").read_text())["nc"] == 3
    # preview compression + zip round-trip
    ds = DatasetStats(yp)
    im_dir = ds.process_images()
    assert len(list(im_dir.glob("*.jpg"))) == 6
    z = zip_directory(hub)
    assert zipfile.ZipFile(z).namelist()


def test_dataset_stats_from_zip(tmp_path):
    from dedark_yolo_tpu.data.stats import DatasetStats, zip_directory
    yp = make_synth_dataset(tmp_path / "pack", n_train=2, n_val=1, imgsz=96)
    z = zip_directory(tmp_path / "pack")
    stats = DatasetStats(z).get_json()
    assert stats["train"]["image_stats"]["total"] == 2


def test_tracker_integration_via_fake_wandb(monkeypatch, tmp_path):
    """A fake wandb module proves init/log/finish wiring without the service."""
    from dedark_yolo_tpu.utils.callbacks import (add_integration_callbacks,
                                                 get_default_callbacks)
    calls = {"init": 0, "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.run = None

    def init(**kw):
        calls["init"] += 1
        fake.run = object()

    def log(metrics, step=None):
        calls["log"].append((dict(metrics), step))

    def finish():
        calls["finish"] += 1
        fake.run = None

    fake.init, fake.log, fake.finish = init, log, finish
    monkeypatch.setitem(sys.modules, "wandb", fake)

    inst = SimpleNamespace(callbacks=get_default_callbacks())
    add_integration_callbacks(inst)
    trainer = SimpleNamespace(
        args=SimpleNamespace(project="p", name="n", plots=False),
        metrics={"metrics/mAP50(B)": 0.5, "val/box_loss": np.float32(1.25)},
        epoch=0, save_dir=tmp_path)
    for cb in inst.callbacks["on_pretrain_routine_start"]:
        cb(trainer)
    for cb in inst.callbacks["on_fit_epoch_end"]:
        cb(trainer)
    for cb in inst.callbacks["on_train_end"]:
        cb(trainer)
    assert calls["init"] == 1 and calls["finish"] == 1
    logged, step = calls["log"][0]
    assert step == 1 and logged["metrics/mAP50B"] == 0.5
    assert logged["val/box_loss"] == 1.25


def _drive_hooks(inst, trainer):
    for hook in ("on_pretrain_routine_start", "on_fit_epoch_end",
                 "on_train_end"):
        for cb in inst.callbacks[hook]:
            cb(trainer)


def _tracker_trainer(tmp_path):
    return SimpleNamespace(
        args=SimpleNamespace(project="p", name="n", plots=False),
        metrics={"metrics/mAP50(B)": 0.5}, epoch=0, save_dir=tmp_path,
        best=tmp_path / "best.npz")


def test_tracker_integration_via_fake_comet(monkeypatch, tmp_path):
    """Fake comet_ml proves Experiment/log_metrics/end wiring (reference
    callbacks/comet.py)."""
    from dedark_yolo_tpu.utils.callbacks import (add_integration_callbacks,
                                                 get_default_callbacks)
    calls = {"params": [], "metrics": [], "end": 0, "models": []}

    class Experiment:
        def __init__(self, project_name=None):
            calls["project"] = project_name

        def log_parameters(self, p):
            calls["params"].append(p)

        def log_metrics(self, m, step=None, epoch=None):
            calls["metrics"].append((dict(m), step))

        def log_model(self, name, path):
            calls["models"].append((name, path))

        def end(self):
            calls["end"] += 1

    fake = types.ModuleType("comet_ml")
    fake.__version__ = "0.0-fake"
    fake.Experiment = Experiment
    monkeypatch.setitem(sys.modules, "comet_ml", fake)

    inst = SimpleNamespace(callbacks=get_default_callbacks())
    add_integration_callbacks(inst)
    trainer = _tracker_trainer(tmp_path)
    trainer.best.write_bytes(b"x")
    _drive_hooks(inst, trainer)
    assert calls["end"] == 1 and calls["project"] == "p"
    assert calls["metrics"][0] == ({"metrics/mAP50B": 0.5}, 1)
    assert calls["models"] == [("best", str(trainer.best))]


def test_tracker_integration_via_fake_neptune(monkeypatch, tmp_path):
    """Fake neptune proves init_run/append/stop wiring (reference
    callbacks/neptune.py)."""
    from dedark_yolo_tpu.utils.callbacks import (add_integration_callbacks,
                                                 get_default_callbacks)
    calls = {"appended": [], "stopped": 0, "assigned": {}}

    class Series:
        def __init__(self, key):
            self.key = key

        def append(self, value=None, step=None):
            calls["appended"].append((self.key, value, step))

    class Run:
        def __getitem__(self, key):
            return Series(key)

        def __setitem__(self, key, value):
            calls["assigned"][key] = value

        def stop(self):
            calls["stopped"] += 1

    fake = types.ModuleType("neptune")
    fake.__version__ = "0.0-fake"
    fake.init_run = lambda project=None, name=None: Run()
    monkeypatch.setitem(sys.modules, "neptune", fake)

    inst = SimpleNamespace(callbacks=get_default_callbacks())
    add_integration_callbacks(inst)
    _drive_hooks(inst, _tracker_trainer(tmp_path))
    assert calls["stopped"] == 1
    assert ("metrics/mAP50B", 0.5, 1) in calls["appended"]
    assert "Configuration/Hyperparameters" in calls["assigned"]


def test_tracker_integration_via_fake_raytune(monkeypatch, tmp_path):
    """Fake ray proves session.report is called only inside a tune session
    (reference callbacks/raytune.py)."""
    from dedark_yolo_tpu.utils.callbacks import (add_integration_callbacks,
                                                 get_default_callbacks)
    reports = []
    enabled = {"v": True}

    ray = types.ModuleType("ray")
    tune = types.ModuleType("ray.tune")
    air = types.ModuleType("ray.air")
    session = types.ModuleType("ray.air.session")
    tune.is_session_enabled = lambda: enabled["v"]
    session.report = lambda m: reports.append(dict(m))
    ray.tune, air.session = tune, session
    for name, mod in (("ray", ray), ("ray.tune", tune), ("ray.air", air),
                      ("ray.air.session", session)):
        monkeypatch.setitem(sys.modules, name, mod)

    inst = SimpleNamespace(callbacks=get_default_callbacks())
    add_integration_callbacks(inst)
    trainer = _tracker_trainer(tmp_path)
    for cb in inst.callbacks["on_fit_epoch_end"]:
        cb(trainer)
    enabled["v"] = False
    for cb in inst.callbacks["on_fit_epoch_end"]:
        cb(trainer)
    assert len(reports) == 1 and reports[0]["epoch"] == 0
    assert reports[0]["metrics/mAP50B"] == 0.5
