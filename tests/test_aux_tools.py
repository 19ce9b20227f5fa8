"""Auxiliary tooling not covered elsewhere: offline lowlight maker, dataset
stats, autobatch sizing, plotting outputs, and model.benchmark().

Reference counterparts: utils/lowlight_process.py:10-96,
utils/clac_dataset_info.py:17-148, utils/autobatch.py:32,
utils/plotting.py:444, utils/benchmarks.py:47-149.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from synth import make_synth_dataset

TINY = str(Path(__file__).parent / "tiny_model.yaml")


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("auxds")
    return str(make_synth_dataset(root, n_train=8, n_val=4, imgsz=128))


def test_lowlight_maker(tmp_path):
    import cv2
    from dedark_yolo_tpu.utils.lowlight_process import apply_lowlight_and_save
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i, shape in enumerate([(64, 80, 3), (64, 80, 3), (48, 48, 3)]):
        cv2.imwrite(str(src / f"im{i}.jpg"),
                    rng.integers(100, 255, shape, dtype=np.uint8))
    dst = tmp_path / "dark"
    apply_lowlight_and_save(str(src), str(dst), lowlight_param=5.0)
    outs = sorted(dst.glob("*.jpg"))
    assert [o.name for o in outs] == ["im0.jpg", "im1.jpg", "im2.jpg"]
    for s, o in zip(sorted(src.glob("*.jpg")), outs):
        a = cv2.imread(str(s)).astype(np.float64).mean()
        b = cv2.imread(str(o)).astype(np.float64).mean()
        assert b < a * 0.5  # img**5 crushes bright images hard


def test_dataset_info(synth, tmp_path):
    from dedark_yolo_tpu.utils.dataset_info import calc_dataset_info
    out = tmp_path / "dataset_status.json"
    result = calc_dataset_info(synth, split="train", out_path=str(out))
    assert result["total_images"] == 8
    assert set(result["classes"]) == {"class0", "class1", "class2"}
    total_inst = sum(v["instances"] for v in result["classes"].values())
    assert total_inst > 0
    for v in result["classes"].values():
        assert v["small"] + v["medium"] + v["large"] == v["instances"]
    assert json.loads(out.read_text())["split"] == "train"


def test_autobatch_sizing():
    """autobatch fits the batch to the (virtual) device memory limit via XLA
    memory analysis, rounding to the divisor; falls back to 16 if analysis is
    unavailable on this platform."""
    import jax.numpy as jnp
    from dedark_yolo_tpu.utils.autobatch import autobatch

    def step(x):
        return (x ** 2).sum()

    def args_fn(b):
        return (jnp.zeros((b, 64, 64, 3), jnp.float32),)

    b = autobatch(step, args_fn, divisor=8, max_batch=64)
    assert b in (16,) or (8 <= b <= 64 and b % 8 == 0)


def test_plot_results_and_annotate(tmp_path):
    from dedark_yolo_tpu.utils.plotting import plot_results, annotate_image
    csv = tmp_path / "results.csv"
    csv.write_text(
        "epoch,train/box_loss,train/cls_loss,metrics/mAP50(B),lr\n"
        "0,3.0,2.5,0.1,0.01\n1,2.0,1.5,0.3,0.008\n")
    plot_results(str(csv))
    assert (tmp_path / "results.png").is_file()
    img = np.full((80, 80, 3), 200, np.uint8)
    dets = np.asarray([[10, 10, 50, 60, 0.9, 0]], np.float32)
    out = annotate_image(img, dets, names={0: "obj"})
    assert out.shape == img.shape and not np.array_equal(out, img)


@pytest.mark.slow
def test_model_benchmark(synth):
    from dedark_yolo_tpu import YOLO
    rows = YOLO(TINY).benchmark(imgsz=64, batch_sizes=(2,), iters=2, warmup=1)
    assert len(rows) == 2  # fp32 + bf16
    for r in rows:
        assert r.get("img_per_sec", 0) > 0 or "error" in r


def test_plot_labels(tmp_path):
    """plot_labels (reference plotting.py:241): labels.jpg +
    labels_correlogram.jpg from normalized xywh boxes + classes."""
    from dedark_yolo_tpu.utils.plotting import plot_labels
    rng = np.random.default_rng(0)
    n = 300
    boxes = np.stack([rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
                      rng.uniform(0.05, 0.4, n), rng.uniform(0.05, 0.4, n)], 1)
    cls = rng.integers(0, 3, n)
    out = plot_labels(boxes, cls, names={0: "a", 1: "b", 2: "c"},
                      save_dir=tmp_path)
    assert out.is_file() and out.stat().st_size > 1000
    assert (tmp_path / "labels_correlogram.jpg").is_file()
    # empty-label robustness
    plot_labels(np.zeros((0, 4)), np.zeros((0,)), save_dir=tmp_path / "e")
    assert (tmp_path / "e" / "labels.jpg").is_file()
