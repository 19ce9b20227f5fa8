"""Classification task test: tiny model must learn colored-square classes."""

from pathlib import Path

import cv2
import numpy as np
import pytest

CLS_TINY = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[-1, 1, "Classify", ["nc"]]],
}


@pytest.fixture(scope="module")
def cls_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("clsds")
    rng = np.random.default_rng(0)
    colors = [(200, 40, 40), (40, 200, 40), (40, 40, 200)]
    for split, n in (("train", 24), ("val", 9)):
        for c, color in enumerate(colors):
            d = root / split / f"color{c}"
            d.mkdir(parents=True)
            for k in range(n // 3):
                img = np.full((64, 64, 3), color, np.uint8)
                img += rng.integers(0, 30, img.shape).astype(np.uint8)
                cv2.imwrite(str(d / f"{k}.jpg"), img)
    return root


def test_classify_dataset_scan(cls_dataset):
    from dedark_yolo_tpu.engine.classify import check_cls_dataset, ClassificationDataset
    data = check_cls_dataset(cls_dataset)
    assert data["nc"] == 3
    ds = ClassificationDataset(data["train"], imgsz=64, names=data["names"])
    assert len(ds) == 24
    img, cid = ds.load(0)
    assert img.shape == (64, 64, 3) and 0 <= cid < 3


def test_classify_parse_and_forward():
    import jax
    import numpy as np
    from dedark_yolo_tpu.nn.graph import DetectionModel
    m = DetectionModel(dict(CLS_TINY))
    assert m.task == "classify"
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    probs = m.apply_eval(v, np.zeros((2, 64, 64, 3), np.float32))
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_classify_training_learns(cls_dataset, tmp_path, monkeypatch):
    import yaml
    from dedark_yolo_tpu.engine.classify import ClassificationTrainer
    yaml_path = tmp_path / "cls_tiny.yaml"
    yaml_path.write_text(yaml.safe_dump(CLS_TINY))
    trainer = ClassificationTrainer({
        "model": str(yaml_path), "data": str(cls_dataset), "epochs": 6,
        "imgsz": 64, "batch": 8, "lr0": 0.05, "project": str(tmp_path / "runs")})
    metrics = trainer.train()
    # trivially-separable colors: top1 must be well above chance (1/3)
    assert metrics["metrics/accuracy_top1"] > 0.6
    assert (tmp_path / "runs" / "train" / "weights" / "last.npz").is_file()
