"""Dynamic-batching inference server (engine/server.py).

The reference has no serving path (perform.py only batch-infers folders);
these tests pin down the new capability: request coalescing into one
fixed-shape compiled batch, letterbox-inverse box scaling per request, and the
stdlib HTTP front-end.
"""

import http.client
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dedark_yolo_tpu.engine.server import InferenceServer

TINY = str(Path(__file__).parent / "tiny_model.yaml")


@pytest.fixture(scope="module")
def server():
    s = InferenceServer(TINY, imgsz=64, max_batch=4, max_wait_ms=40.0,
                        conf=0.001, max_det=10)
    yield s
    s.close()


def test_concurrent_requests_coalesce(server):
    rng = np.random.default_rng(0)
    # different original sizes: exercises per-request letterbox inverse
    imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            for h, w in [(80, 120), (64, 64), (100, 60)]]
    futs = [server.submit(im) for im in imgs]
    outs = [f.result(timeout=120) for f in futs]
    for im, out in zip(imgs, outs):
        boxes = out["boxes"]
        assert boxes.ndim == 2 and boxes.shape[1] == 6
        assert boxes.dtype == np.float32
        if len(boxes):
            # boxes are in ORIGINAL image coords, clipped to the frame
            h, w = im.shape[:2]
            assert boxes[:, [0, 2]].max() <= w + 1e-3
            assert boxes[:, [1, 3]].max() <= h + 1e-3
            assert boxes[:, :4].min() >= -1e-3
        assert out["latency_ms"] > 0
    st = server.stats()
    assert st["requests"] == 3
    # 3 requests submitted within one 40ms window must not take 3 batches each
    assert 1 <= st["batches"] <= 3
    assert st["mean_batch_occupancy"] >= 1.0


def test_http_front_end(server):
    import cv2
    httpd, port = server.serve(port=0)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200

        img = np.full((48, 80, 3), 128, np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        conn.request("POST", "/predict", body=enc.tobytes())
        r = conn.getresponse()
        assert r.status == 200
        payload = json.loads(r.read())
        assert "boxes" in payload and isinstance(payload["boxes"], list)
        assert payload["names"], "class-name map should be populated"

        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert st["requests"] >= 1 and st["max_batch"] == 4
        conn.close()
    finally:
        httpd.shutdown()


def test_serve_exported_artifact(tmp_path):
    """The server also deploys jax.export .bin artifacts: fixed shapes + class
    names come from the exporter's .json sidecar; NMS runs server-side."""
    from dedark_yolo_tpu import YOLO

    m = YOLO(TINY)
    path = m.export(format="export", imgsz=64, batch=2, project=str(tmp_path))
    assert Path(path + ".json").is_file(), "exporter writes a sidecar"

    s = InferenceServer(path, imgsz=512, max_batch=7,  # overridden by sidecar
                        max_wait_ms=10.0, conf=0.001, max_det=10)
    try:
        assert s.imgsz == 64 and s.max_batch == 2
        assert s.names, "names restored from the sidecar"
        out = s.predict(np.full((50, 90, 3), 90, np.uint8))
        assert out["boxes"].shape[1] == 6
    finally:
        s.close()


def test_submit_after_close_raises():
    s = InferenceServer(TINY, imgsz=64, max_batch=2, warmup=False)
    s.close()
    with pytest.raises(RuntimeError):
        s.submit(np.zeros((32, 32, 3), np.uint8))


def test_malformed_request_fails_only_itself(server):
    """A bad image in a coalesced batch must not poison the other clients'
    requests in the same window."""
    bad = np.zeros((32, 32), np.uint8)           # grayscale: no channel dim
    good = np.zeros((40, 40, 3), np.uint8)
    f_bad = server.submit(bad)
    f_good = server.submit(good)
    with pytest.raises(ValueError, match="HWC-BGR"):
        f_bad.result(timeout=120)
    out = f_good.result(timeout=120)             # unaffected
    assert out["boxes"].shape[1] == 6


def test_close_drains_queued_requests():
    """Requests still queued at close() get an explicit error, not a hang."""
    from concurrent.futures import Future
    s = InferenceServer(TINY, imgsz=64, max_batch=2, warmup=False)
    # freeze the worker first so the item can't be consumed, then close():
    # models a submit racing close into the un-drained queue
    s._stop.set()
    s._worker.join(timeout=10)
    fut = Future()
    s._q.put((np.zeros((8, 8, 3), np.uint8), fut, 0.0))
    s.close()
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=5)


def _write_yaml(tmp_path, spec, name):
    import yaml
    p = tmp_path / name
    p.write_text(yaml.safe_dump(spec))
    return str(p)


def test_serve_segment_task(tmp_path):
    """Segment model responses carry per-detection masks in ORIGINAL image
    coords (the predictor's extra_fields hook runs server-side)."""
    from test_segment_task import SEG_TINY
    s = InferenceServer(_write_yaml(tmp_path, SEG_TINY, "seg.yaml"),
                        imgsz=64, max_batch=2, max_wait_ms=5.0,
                        conf=0.001, max_det=8)
    try:
        img = np.random.default_rng(2).integers(0, 255, (70, 50, 3),
                                                dtype=np.uint8)
        out = s.predict(img)
        assert "masks" in out
        k = len(out["boxes"])
        assert out["masks"].shape == (k, 70, 50)
        assert out["masks"].dtype == bool
    finally:
        s.close()


def test_serve_pose_task(tmp_path):
    from test_pose_task import POSE_TINY
    s = InferenceServer(_write_yaml(tmp_path, POSE_TINY, "pose.yaml"),
                        imgsz=64, max_batch=2, max_wait_ms=5.0,
                        conf=0.001, max_det=8)
    try:
        out = s.predict(np.full((60, 80, 3), 70, np.uint8))
        assert "keypoints" in out
        k = len(out["boxes"])
        assert out["keypoints"].shape[0] == k
        if k:  # keypoints scaled into original image coords
            assert out["keypoints"][..., 0].max() <= 80 + 1e-3
            assert out["keypoints"][..., 1].max() <= 60 + 1e-3
    finally:
        s.close()


def test_mesh_sharded_serving():
    """Requests served over an 8-device data mesh: params replicated, the
    coalesced batch sharded — XLA SPMD splits the whole serving graph."""
    from dedark_yolo_tpu.parallel import make_mesh
    mesh = make_mesh()
    s = InferenceServer(TINY, imgsz=64, max_batch=8, max_wait_ms=20.0,
                        conf=0.001, max_det=10, mesh=mesh)
    try:
        futs = [s.submit(np.full((48, 48, 3), 60 + 10 * i, np.uint8))
                for i in range(3)]
        outs = [f.result(timeout=120) for f in futs]
        for out in outs:
            assert out["boxes"].shape[1] == 6
        # one mesh-sharded result must equal the single-device server's
        s2 = InferenceServer(TINY, imgsz=64, max_batch=8, max_wait_ms=1.0,
                             conf=0.001, max_det=10, warmup=False)
        try:
            ref = s2.predict(np.full((48, 48, 3), 60, np.uint8))
            np.testing.assert_allclose(outs[0]["boxes"], ref["boxes"],
                                       rtol=1e-4, atol=5e-3)
        finally:
            s2.close()
        with pytest.raises(AssertionError, match="multiple of the mesh"):
            InferenceServer(TINY, imgsz=64, max_batch=3, warmup=False,
                            mesh=mesh)
    finally:
        s.close()


def test_classify_rejected():
    import yaml as _y
    spec = {"nc": 3, "backbone": [[-1, 1, "Conv", [8, 3, 2]]],
            "head": [[-1, 1, "Classify", ["nc"]]]}
    p = Path("/tmp/cls_tiny_server.yaml")
    p.write_text(_y.safe_dump(spec))
    with pytest.raises(ValueError, match="detection-family"):
        InferenceServer(str(p), imgsz=64, max_batch=2, warmup=False)
