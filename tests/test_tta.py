"""Test-time augmentation (reference tasks.py:303-343 _predict_augment /
_descale_pred / _clip_augmented): 3 scales + lr flip, descale into the
original frame, clip extreme-scale anchor tails, one NMS over the union."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn.graph import DetectionModel

TINY = str(Path(__file__).parent / "tiny_model.yaml")

# Every test here compiles the 3-branch tta_eval graph (3 forwards of the
# tiny model) — >tiny per the tests/README contract, so the module is slow.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    d = model_yaml_load(TINY)
    model = DetectionModel(d)
    v = model.init(jax.random.PRNGKey(0), imgsz=128)
    img = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (2, 128, 128, 3)), jnp.float32)
    return model, v, img


def test_tta_shapes_match_reference_arithmetic(tiny):
    """Candidate count = (A0 - A0/g) + A1 + (A2 - A2/g*4^(nl-1)) with
    g = sum(4^i, i<nl) — the reference's _clip_augmented indices. At 128px:
    scale 1 -> 336 anchors (-16 P5 tail), 0.83 -> pad 128 -> 336,
    0.67 -> pad 96 -> 189 (-144 P3 head) = 701 total."""
    model, v, img = tiny
    boxes, scores = model.tta_eval(v, img)
    assert boxes.shape == (2, 701, 4)
    assert scores.shape == (2, 701, model.nc)
    assert np.isfinite(np.asarray(boxes)).all()


def test_tta_scale1_pass_is_bitwise_plain_inference(tiny):
    """The unscaled, unflipped pass inside TTA must be the SAME forward as
    plain apply_eval — its surviving (P3+P4) candidates match bit-for-bit."""
    model, v, img = tiny
    tta_b, tta_s = jax.jit(model.tta_eval)(v, img)
    ref_b, ref_s = jax.jit(model.apply_eval)(v, img)
    keep = 336 - 16  # A0 minus the clipped P5 tail
    np.testing.assert_allclose(np.asarray(tta_b[:, :keep]),
                               np.asarray(ref_b[:, :keep]), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(tta_s[:, :keep]),
                               np.asarray(ref_s[:, :keep]), rtol=1e-5,
                               atol=1e-6)


def test_tta_flip_descale_inverts_exactly(tiny):
    """Black-box check of _descale_pred: the middle (0.83, lr-flip) pass's
    candidates equal apply_eval on the manually flipped+scaled+padded input
    with x-centers mirrored back (x -> W - x) and boxes /scale."""
    import math
    from dedark_yolo_tpu.nn.enhance import torch_bilinear_resize
    model, v, img = tiny
    h = w = 128
    si, gs = 0.83, int(max(model.strides))
    xi = img[:, :, ::-1, :]
    sh, sw = int(h * si), int(w * si)
    xi = torch_bilinear_resize(xi, sh, sw)
    ph = math.ceil(h * si / gs) * gs
    pw = math.ceil(w * si / gs) * gs
    xi = jnp.pad(xi, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)),
                 constant_values=0.447)
    b, s = model.apply_eval(v, xi)
    b = b / si
    b = b.at[..., 0].set(w - b[..., 0])

    tta_b, tta_s = model.tta_eval(v, img)
    mid_b, mid_s = tta_b[:, 320:320 + 336], tta_s[:, 320:320 + 336]
    np.testing.assert_allclose(np.asarray(mid_b), np.asarray(b),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mid_s), np.asarray(s),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_predict_augment_end_to_end(tmp_path):
    """YOLO.predict(augment=True) runs TTA through the streaming predictor."""
    import cv2
    from dedark_yolo_tpu import YOLO
    rng = np.random.default_rng(0)
    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f"i{i}.jpg"),
                    rng.integers(0, 255, (100, 120, 3)).astype(np.uint8))
    m = YOLO(TINY)
    res = m.predict(str(src), imgsz=128, conf=0.0, max_det=10, max_nms=128,
                    augment=True, save=False)
    assert len(res) == 2
    for r in res:
        assert r.boxes.xyxy.shape[1] == 4
