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


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_decode_maxside_matches_cv2(tmp_path):
    import cv2
    rng = np.random.default_rng(2)
    # smooth content (JPEG is lossy; use low-frequency images for comparison)
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (300, 220, 3), dtype=np.uint8), (31, 31), 8)
    p = tmp_path / "a.jpg"
    cv2.imwrite(str(p), base, [cv2.IMWRITE_JPEG_QUALITY, 95])
    size = 160
    imgs, shapes = native.decode_maxside_batch([str(p)], size)
    lh, lw, h0, w0 = shapes[0]
    assert (h0, w0) == (300, 220)
    assert (lh, lw) == (160, 117)  # max-side resize, int truncation like cv2
    ref = cv2.imread(str(p))
    r = size / max(ref.shape[:2])
    ref_r = cv2.resize(ref, (int(220 * r), int(300 * r)))
    diff = np.abs(imgs[0, :lh, :lw].astype(int) - ref_r.astype(int))
    assert diff.mean() < 3.0  # DCT-scaled decode + our resize vs cv2 path


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_decode_letterbox(tmp_path):
    import cv2
    img = np.full((200, 100, 3), 200, np.uint8)
    img[:, :, 0] = 50  # distinct B channel to verify RGB output order
    p = tmp_path / "b.jpg"
    cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 98])
    out, osh = native.decode_letterbox_batch([str(p)], 128, fill=114)
    assert out.shape == (1, 128, 128, 3)
    np.testing.assert_array_equal(osh[0], [200, 100])
    # center column is image (RGB: R~200, B~50), sides are pad
    assert out[0, 64, 64, 0] > 150 and out[0, 64, 64, 2] < 100
    assert (out[0, 64, 2] == 114).all()
    # decode failure -> zeros
    bad = tmp_path / "c.jpg"
    bad.write_bytes(b"not a jpeg")
    out2, osh2 = native.decode_letterbox_batch([str(bad)], 64)
    assert (osh2[0] == 0).all()
