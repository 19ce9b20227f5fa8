"""Native C++ letterbox vs the cv2 reference implementation."""

import numpy as np
import pytest

from dedark_yolo_tpu import native
from dedark_yolo_tpu.data.augment import letterbox as cv2_letterbox


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_letterbox_matches_cv2():
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
              for h, w in [(120, 200), (200, 120), (160, 160), (97, 131)]]
    size = 160
    out = native.letterbox_batch(images, size, fill=114, swap_rb=True)
    assert out.shape == (4, size, size, 3)
    for i, img in enumerate(images):
        want_bgr, _, _ = cv2_letterbox(img, size)
        want = want_bgr[..., ::-1]  # native output is RGB
        got = out[i]
        # pad region must match exactly
        pad_mask = (want[..., 0] == 114) & (want[..., 1] == 114) & (want[..., 2] == 114)
        np.testing.assert_array_equal(got[pad_mask], want[pad_mask])
        # interpolated interior within 2 LSB of cv2's fixed-point bilinear
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.mean() < 1.0
        assert (diff <= 3).mean() > 0.995, f"image {i}: {(diff > 3).mean():.4f} off"


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_letterbox_identity_size():
    img = np.arange(160 * 160 * 3, dtype=np.uint8).reshape(160, 160, 3)
    out = native.letterbox_batch([img], 160, swap_rb=False)
    np.testing.assert_array_equal(out[0], img)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_threads_deterministic():
    rng = np.random.default_rng(1)
    images = [rng.integers(0, 255, (100 + i, 150 - i, 3), dtype=np.uint8)
              for i in range(16)]
    a = native.letterbox_batch(images, 128, n_threads=1)
    b = native.letterbox_batch(images, 128, n_threads=8)
    np.testing.assert_array_equal(a, b)
