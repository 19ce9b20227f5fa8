"""Streaming + in-memory inference sources (reference data/loaders.py:
LoadStreams :31-117, LoadScreenshots :119-160, LoadPilAndNumpy/LoadTensor
:270-311). A looped mp4 stands in for an RTSP feed — cv2.VideoCapture
accepts both, so the thread/coalesce/EOF machinery is identical."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

TINY = str(Path(__file__).parent / "tiny_model.yaml")
KW = dict(max_nms=256, max_det=20, plots=False)


def _write_clip(path, n_frames=6, size=(128, 96), seed=0):
    import cv2
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, size)
    rng = np.random.default_rng(seed)
    for _ in range(n_frames):
        w.write(rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8))
    w.release()
    return path


def test_is_stream_source():
    from dedark_yolo_tpu.data.loaders import is_stream_source
    assert is_stream_source(0) and is_stream_source("0")
    assert is_stream_source("rtsp://cam/live")
    assert is_stream_source("rtmp://x") and is_stream_source("http://x/feed")
    assert is_stream_source("list.streams")
    assert not is_stream_source("img.jpg")
    assert not is_stream_source("video.mp4")
    assert not is_stream_source(["a.jpg"])


def test_load_streams_single_file_as_fake_stream(tmp_path):
    from dedark_yolo_tpu.data.loaders import LoadStreams
    clip = _write_clip(tmp_path / "feed.mp4", n_frames=6)
    s = LoadStreams(str(clip), vid_stride=1)
    frames = []
    for paths, imgs, metas in s:
        assert paths == [str(clip)]
        assert imgs[0].shape == (96, 128, 3)
        assert metas[0][1] > 0  # fps
        frames.extend(imgs)
        if len(frames) > 20:  # safety net
            break
    assert 1 <= len(frames) <= 6  # EOF terminates, never hangs


def test_load_streams_list_file_coalesces(tmp_path):
    from dedark_yolo_tpu.data.loaders import LoadStreams
    a = _write_clip(tmp_path / "a.mp4", n_frames=8, seed=1)
    b = _write_clip(tmp_path / "b.mp4", n_frames=8, seed=2)
    lst = tmp_path / "cams.streams"
    lst.write_text(f"{a}\n{b}\n")
    s = LoadStreams(str(lst))
    paths, imgs, metas = next(iter(s))
    assert len(paths) == 2 and len(imgs) == 2
    assert {Path(p).name for p in paths} == {"a.mp4", "b.mp4"}
    s.close()
    assert not any(t.is_alive() for t in s.threads)


def test_load_streams_bad_source():
    from dedark_yolo_tpu.data.loaders import LoadStreams
    with pytest.raises(ConnectionError):
        LoadStreams("/nonexistent/feed.mp4")


def test_pil_and_tensor_conversion():
    from dedark_yolo_tpu.data.loaders import pil_to_bgr, tensor_to_bgr_list
    PIL = pytest.importorskip("PIL.Image")
    rgb = np.zeros((8, 10, 3), np.uint8)
    rgb[..., 0] = 200  # red in RGB
    im = PIL.fromarray(rgb)
    bgr = pil_to_bgr(im)
    assert bgr[0, 0, 2] == 200 and bgr[0, 0, 0] == 0  # red landed in ch 2

    t = np.zeros((2, 3, 8, 10), np.float32)
    t[:, 1] = 1.0  # green, 0-1 float
    out = tensor_to_bgr_list(t)
    assert len(out) == 2 and out[0].shape == (8, 10, 3)
    assert out[0][0, 0, 1] == 255 and out[0][0, 0, 0] == 0
    with pytest.raises(ValueError):
        tensor_to_bgr_list(np.zeros((2, 4, 8, 10)))  # not 3-channel


def test_screenshots_guarded_and_fake_mss(monkeypatch):
    from dedark_yolo_tpu.data.loaders import LoadScreenshots

    # absent mss -> clear ImportError naming the package
    monkeypatch.setitem(sys.modules, "mss", None)
    with pytest.raises(ImportError, match="mss"):
        LoadScreenshots("screen")

    # fake mss pins the grab contract (monitor dict, BGRA frames)
    grabbed = []

    class FakeSct:
        monitors = [{"left": 0, "top": 0, "width": 64, "height": 48},
                    {"left": 0, "top": 0, "width": 64, "height": 48}]

        def grab(self, monitor):
            grabbed.append(dict(monitor))
            return np.zeros((monitor["height"], monitor["width"], 4),
                            np.uint8)

    fake = types.ModuleType("mss")
    fake.mss = FakeSct
    monkeypatch.setitem(sys.modules, "mss", fake)
    ls = LoadScreenshots("screen 0 4 6 32 16", max_frames=2)
    frames = list(ls)
    assert len(frames) == 2
    paths, imgs, metas = frames[0]
    assert imgs[0].shape == (16, 32, 3)  # BGRA -> BGR, region size
    assert grabbed[0] == {"left": 4, "top": 6, "width": 32, "height": 16}


@pytest.mark.slow
def test_predict_from_stream_pil_and_tensor(tmp_path):
    """predict(source=<.streams file>) / (PIL image) / (CHW tensor) run the
    full compiled path (reference predictor source mux, build.py:138-170)."""
    import cv2

    from dedark_yolo_tpu import YOLO

    clip = _write_clip(tmp_path / "cam.mp4", n_frames=5)
    lst = tmp_path / "one.streams"
    lst.write_text(f"{clip}\n")
    m = YOLO(TINY)
    res = m.predict(str(lst), imgsz=96, conf=0.01, batch=2, **KW)
    assert 1 <= len(res) <= 5
    assert res[0].source_meta is not None  # stream frames carry meta

    PIL = pytest.importorskip("PIL.Image")
    img = PIL.fromarray(np.random.default_rng(0).integers(
        0, 255, (96, 128, 3), dtype=np.uint8))
    res = m.predict(img, imgsz=96, conf=0.01, **KW)
    assert len(res) == 1 and res[0].orig_img.shape == (96, 128, 3)

    import torch
    t = torch.rand(2, 3, 96, 96)
    res = m.predict(t, imgsz=96, conf=0.01, batch=2, **KW)
    assert len(res) == 2
