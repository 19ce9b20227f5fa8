"""Dynamic-batching inference server: the production serving path.

The reference has no serving story beyond perform.py's folder loop
(perform.py:107-288 batch-infers a directory and writes a stats JSON); a
deployment there means gluing the predictor into someone else's server. Here
serving is first-class and TPU-shaped: requests arriving on independent
threads are coalesced into ONE fixed-shape batch (pad to `max_batch`, a single
XLA program, no re-tracing), ride the same jitted
enhance+backbone+decode+NMS graph as the predictor, and are demultiplexed back
to per-request futures. Fixed shapes mean the first warmup compile is the only
compile the server ever does.

Two front-ends share the batcher:
  - in-process: ``submit(img_bgr) -> Future`` (embedding into an existing app);
  - HTTP (stdlib, no extra deps): ``serve(port)`` exposes
        POST /predict   image bytes (jpg/png)        -> detections JSON
        GET  /healthz   liveness
        GET  /stats     throughput / latency / batch-occupancy counters

Batching policy: the worker blocks for the first request, then waits at most
``max_wait_ms`` for followers (classic dynamic batching — bounded tail latency,
full batches under load). Results are scaled to each request's original image
space with the letterbox inverse (reference ops.py:95-125).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from concurrent.futures import Future
from queue import Empty, Queue

import jax
import numpy as np

from ..cfg import get_cfg, DEFAULT_CFG_DICT
from ..data.augment import letterbox
from ..ops.boxes import scale_boxes
from ..utils import LOGGER


class InferenceServer:
    """Coalesce concurrent detection requests into fixed-shape device batches.

    model_spec: .npz checkpoint / .yaml architecture (anything YOLO() accepts).
    max_batch:  the ONE compiled batch shape; also the coalescing cap.
    max_wait_ms: how long the worker holds the first request for followers.
    """

    def __init__(self, model_spec, imgsz=640, max_batch=8, max_wait_ms=5.0,
                 conf=0.25, iou=0.7, max_det=300, max_nms=2048, half=False,
                 warmup=True, mesh=None):
        self.imgsz = int(imgsz)
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        # multi-chip serving: params replicated, the request batch sharded
        # over the mesh's leading axis — XLA SPMD splits the whole
        # enhance+detect+NMS graph across chips (same declarative pattern as
        # the trainer; jit follows the operands' shardings)
        self._mesh = mesh
        if mesh is not None:
            from pathlib import Path as _P
            is_artifact = (str(model_spec).endswith((".bin", ".tflite"))
                           or (_P(str(model_spec)) / "saved_model.pb").is_file())
            assert not is_artifact, (
                "exported artifacts (.bin/.tflite/saved_model) carry fixed "
                "single-device shapes; serve the checkpoint instead to shard "
                "over a mesh")
            assert self.max_batch % mesh.devices.size == 0, (
                f"max_batch {self.max_batch} must be a multiple of the mesh "
                f"size {mesh.devices.size}")

        self._q: Queue = Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._n_images = 0
        self._lat_ms = deque(maxlen=1024)
        self._t_start = time.time()

        # ALL device interaction — model build, jit, warmup, dispatch,
        # readback — lives on the worker thread: remote-device transports can
        # stall indefinitely when buffers created on one thread are read back
        # from another
        self._ready = threading.Event()
        self._setup_exc = None
        self._setup_args = (str(model_spec), conf, iou, max_det, max_nms,
                            half, warmup)
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="dedark-batcher")
        self._worker.start()
        self._ready.wait(timeout=1800)
        if self._setup_exc is not None:
            self._stop.set()
            raise self._setup_exc
        if not self._ready.is_set():
            self._stop.set()
            raise TimeoutError("server setup (compile/warmup) timed out")

    def _setup(self):
        model_spec, conf, iou, max_det, max_nms, half, warmup = \
            self._setup_args
        mesh = self._mesh
        spec_s = str(model_spec)
        from pathlib import Path as _P
        if spec_s.endswith((".bin", ".tflite")) or \
                (_P(spec_s) / "saved_model.pb").is_file():
            # exported artifact (.bin jax.export / .tflite / saved_model):
            # the artifact's own batch/imgsz win — its sidecar carries them,
            # plus the class names AND the task, so segment/pose artifacts
            # serve with masks/keypoints too
            from .autobackend import AutoBackend
            backend = AutoBackend(model_spec, imgsz=self.imgsz,
                                  batch=self.max_batch)
            self.imgsz, self.max_batch = backend.imgsz, backend.batch
            self.names = dict(backend.names)
            btask = getattr(backend, "task", "detect")
            if btask == "segment":
                from .segment import SegmentationPredictor as Pred
            elif btask == "pose":
                from .pose import PosePredictor as Pred
            elif btask == "classify":
                raise ValueError(
                    "InferenceServer serves detection-family tasks "
                    "(detect/segment/pose); use YOLO.predict for classify")
            else:
                from .predictor import DetectionPredictor as Pred
            args = get_cfg(DEFAULT_CFG_DICT, dict(
                conf=conf, iou=iou, max_det=max_det, max_nms=max_nms,
                half=half, batch=self.max_batch, imgsz=self.imgsz))
            pred = Pred(args=args, model=backend, names=backend.names)
            self._pred = pred
            self._members = ()
            self._step = pred._make_step()
        else:
            from .model import YOLO

            y = YOLO(str(model_spec))
            y._ensure_params(self.imgsz)
            self.names = {int(k): v for k, v in (y.names or {}).items()}
            args = get_cfg(DEFAULT_CFG_DICT, dict(
                conf=conf, iou=iou, max_det=max_det, max_nms=max_nms,
                half=half, batch=self.max_batch, imgsz=self.imgsz))
            # same task dispatch as YOLO.predict: segment/pose responses carry
            # masks/keypoints through the predictor's extra_fields hook
            task = getattr(y.model, "task", "detect")
            if task == "segment":
                from .segment import SegmentationPredictor as Pred
            elif task == "pose":
                from .pose import PosePredictor as Pred
            elif task == "classify":
                raise ValueError(
                    "InferenceServer serves detection-family tasks "
                    "(detect/segment/pose); use YOLO.predict for classify")
            else:
                from .predictor import DetectionPredictor as Pred
            pred = Pred(args=args, model=y.model, params=y.params,
                        batch_stats=y.batch_stats, names=y.names)
            self._pred = pred
            self._members = tuple(pred.members)
            if mesh is not None:
                from ..parallel import replicate
                self._members = replicate(mesh, self._members)
            self._step = pred._make_step()

        if warmup:
            z = np.zeros((self.max_batch, self.imgsz, self.imgsz, 3), np.uint8)
            if mesh is not None:
                # warm up with the REAL input sharding or the first request
                # recompiles (jit caches by operand sharding, not just shape)
                from ..parallel import batch_sharding
                z = jax.device_put(z, batch_sharding(mesh))
            out = self._step(self._members, z)
            np.asarray(out["counts"])  # force a real readback, not just enqueue

    # ------------------------------------------------------------- client API
    def submit(self, img_bgr: np.ndarray) -> Future:
        """Enqueue one HWC-BGR uint8 image; resolves to a detections dict:
        {"boxes": (k,6) float32 [x1,y1,x2,y2,conf,cls] in ORIGINAL image
        coords, "names": class-name map, "latency_ms": server-side latency}."""
        if self._stop.is_set():
            raise RuntimeError("server is closed")
        fut: Future = Future()
        self._q.put((img_bgr, fut, time.perf_counter()))
        with self._lock:
            self._n_requests += 1
        return fut

    def predict(self, img_bgr, timeout=60.0):
        """Blocking convenience wrapper around submit()."""
        return self.submit(img_bgr).result(timeout=timeout)

    def stats(self):
        with self._lock:
            lats = sorted(self._lat_ms)
            n = len(lats)
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "mean_batch_occupancy": (self._n_images / self._n_batches
                                         if self._n_batches else 0.0),
                "latency_ms_p50": lats[n // 2] if n else 0.0,
                "latency_ms_p95": lats[min(n - 1, int(n * 0.95))] if n else 0.0,
                "uptime_s": time.time() - self._t_start,
                "imgsz": self.imgsz,
                "max_batch": self.max_batch,
            }

    def reset_stats(self):
        """Zero the counters/latency window (e.g. between load phases)."""
        with self._lock:
            self._n_requests = self._n_batches = self._n_images = 0
            self._lat_ms.clear()
            self._t_start = time.time()

    def close(self):
        self._stop.set()
        self._q.put(None)  # unblock the worker
        self._worker.join(timeout=30)
        # fail anything still queued (including submits that raced close):
        # a hung-forever future is worse than an explicit error
        while True:
            try:
                item = self._q.get_nowait()
            except Empty:
                break
            if item is not None and not item[1].done():
                item[1].set_exception(RuntimeError("server closed"))

    # ---------------------------------------------------------------- batcher
    def _collect(self, block=True):
        """One coalescing window: block for the first request (unless a batch
        is already in flight: block=False grabs only what's queued right
        now), then drain up to max_batch within max_wait_ms."""
        try:
            first = self._q.get(timeout=0.25) if block else self._q.get_nowait()
        except Empty:
            return []
        if first is None:
            return []
        items = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(items) < self.max_batch:
            left = deadline - time.perf_counter()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _run(self):
        """Single-threaded depth-2 pipeline (all jax calls on one thread —
        remote transports are not thread-safe for concurrent dispatch +
        readback): dispatch batch i+1 BEFORE reading back batch i, so batch
        i+1's letterbox + host->device upload overlap batch i's execution.
        With nothing queued, the pending batch resolves immediately."""
        try:
            self._setup()
        except Exception as e:
            self._setup_exc = e
            self._ready.set()
            return
        self._ready.set()
        pending = None
        while not self._stop.is_set():
            if pending is None:
                items = self._collect()          # blocking coalesce window
            else:
                items = self._collect(block=False)  # grab what's queued NOW
            dispatched = None
            if items:
                try:
                    dispatched = self._dispatch(items)
                except Exception as e:  # propagate to the waiting clients
                    LOGGER.error(f"serving batch failed: {e}")
                    for _, fut, _ in items:
                        if not fut.done():
                            fut.set_exception(e)
            if pending is not None:
                self._finish(pending)
            pending = dispatched
        if pending is not None:
            self._finish(pending)

    def _finish(self, pending):
        items, shapes, out = pending
        try:
            self._demux(items, shapes, out)
        except Exception as e:
            LOGGER.error(f"serving readback failed: {e}")
            for _, fut, _ in items:
                if not fut.done():
                    fut.set_exception(e)

    def _dispatch(self, items):
        # per-item validation FIRST: one malformed request must fail only its
        # own future, never the other clients coalesced into the same batch
        good = []
        for img, fut, t_in in items:
            if (isinstance(img, np.ndarray) and img.ndim == 3
                    and img.shape[2] == 3 and img.shape[0] > 0
                    and img.shape[1] > 0 and img.dtype == np.uint8):
                good.append((img, fut, t_in))
            elif not fut.done():
                fut.set_exception(ValueError(
                    "expected HWC-BGR uint8 image, got "
                    f"{getattr(img, 'dtype', '')} shape "
                    f"{getattr(img, 'shape', type(img).__name__)}"))
        items = good
        if not items:
            return None
        n = len(items)
        sz = self.imgsz
        shapes = [img.shape[:2] for img, _, _ in items]
        from .. import native as _native
        if _native.available():
            # batched GIL-free C++ letterbox incl. the BGR->RGB swap (same
            # path the predictor uses, predictor.py flush)
            srcs = [np.ascontiguousarray(img) for img, _, _ in items]
            srcs += [srcs[0]] * (self.max_batch - n)
            batch = _native.letterbox_batch(srcs, sz, fill=114, swap_rb=True)
        else:
            batch = np.zeros((self.max_batch, sz, sz, 3), np.uint8)
            for i, (img, _, _) in enumerate(items):
                lb, _, _ = letterbox(img, sz)
                batch[i] = lb[..., ::-1]  # BGR -> RGB
        if self._mesh is not None:
            from ..parallel import batch_sharding
            batch = jax.device_put(batch, batch_sharding(self._mesh))
        out = self._step(self._members, batch)  # async dispatch
        return items, shapes, out

    def _demux(self, items, shapes, out):
        dets = np.asarray(out["dets"])   # blocks until the batch completes
        counts = np.asarray(out["counts"])
        t_done = time.perf_counter()
        n = len(items)
        sz = self.imgsz
        with self._lock:
            self._n_batches += 1
            self._n_images += n
        pred = getattr(self, "_pred", None)
        for i, (_, fut, t_in) in enumerate(items):
            k = int(counts[i])
            det = dets[i, :k].copy()
            if k:
                det[:, :4] = np.asarray(
                    scale_boxes((sz, sz), det[:, :4], shapes[i]))
            lat = (t_done - t_in) * 1000.0
            with self._lock:
                self._lat_ms.append(lat)
            res = {"boxes": det.astype(np.float32),
                   "names": self.names, "latency_ms": lat}
            if pred is not None:
                # segment: masks (k, H0, W0) bool; pose: keypoints (k, K, 3)
                # in original image coords — same hook the predictor uses
                res.update(pred.extra_fields(out, i, k, shapes[i], sz))
            fut.set_result(res)

    # ------------------------------------------------------------------- HTTP
    def serve(self, port=0, host="127.0.0.1"):
        """Start the stdlib HTTP front-end; returns (httpd, bound_port).
        Serves on a daemon thread; call httpd.shutdown() to stop."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # route through our logger, quietly
                pass

            def _json(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"status": "ok"})
                elif self.path == "/stats":
                    self._json(200, server.stats())
                else:
                    self._json(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path != "/predict":
                    return self._json(404, {"error": "unknown path"})
                try:
                    import cv2
                    length = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(length)
                    img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                       cv2.IMREAD_COLOR)
                    if img is None:
                        return self._json(400, {"error": "undecodable image"})
                    r = server.predict(img)
                    payload = {
                        "boxes": r["boxes"].tolist(),
                        "names": {str(k): v for k, v in r["names"].items()},
                        "latency_ms": r["latency_ms"],
                    }
                    if "keypoints" in r:
                        payload["keypoints"] = np.asarray(
                            r["keypoints"]).tolist()
                    if "masks" in r:
                        # bitmap masks -> external contour polygons (JSON-able)
                        polys = []
                        for m in r["masks"]:
                            cs, _ = cv2.findContours(
                                m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                cv2.CHAIN_APPROX_SIMPLE)
                            best = (max(cs, key=cv2.contourArea)
                                    if cs else np.zeros((0, 1, 2), np.int32))
                            polys.append(best.reshape(-1, 2).tolist())
                        payload["masks"] = polys
                    self._json(200, payload)
                except Exception as e:
                    self._json(500, {"error": str(e)})

        httpd = ThreadingHTTPServer((host, port), Handler)
        t = threading.Thread(target=httpd.serve_forever, daemon=True,
                             name="dedark-http")
        t.start()
        bound = httpd.server_address[1]
        LOGGER.info(f"serving on http://{host}:{bound} "
                    f"(batch<= {self.max_batch}, wait {self.max_wait_s * 1e3:.0f}ms)")
        return httpd, bound
