"""Serving benchmark: dynamic-batching InferenceServer on one TPU chip.

Measures the flagship (Dedark-YOLOv8L+ASFF @640) through engine/server.py:
  - unloaded single-client round-trip latency (batch occupancy ~1);
  - saturated throughput + latency percentiles with many concurrent clients
    (batches coalesce toward max_batch).

Usage: python scripts/serve_bench.py [--max-batch 32] [--clients 16]
       [--requests 12] [--imgsz 640]
"""

import argparse
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov8l.yaml")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=4.0)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=12,
                    help="requests per client in the loaded phase")
    args = ap.parse_args()

    from dedark_yolo_tpu.engine.server import InferenceServer

    t0 = time.time()
    srv = InferenceServer(args.model, imgsz=args.imgsz,
                          max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms, conf=0.25)
    print(f"server up (warmup compile {time.time() - t0:.0f}s)")

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (720, 960, 3), dtype=np.uint8)
            for _ in range(8)]

    # phase 1: unloaded single-client latency
    lats = []
    for i in range(10):
        t = time.perf_counter()
        srv.predict(imgs[i % len(imgs)])
        lats.append((time.perf_counter() - t) * 1e3)
    lats.sort()
    print(f"unloaded: p50 {lats[5]:.1f} ms  max {lats[-1]:.1f} ms "
          f"(occupancy {srv.stats()['mean_batch_occupancy']:.2f})")
    srv.reset_stats()  # keep the loaded-phase percentiles uncontaminated

    # phase 2: saturation with concurrent clients
    n_ok = [0]
    lock = threading.Lock()

    def client(cid):
        r = np.random.default_rng(cid)
        for i in range(args.requests):
            srv.predict(imgs[int(r.integers(len(imgs)))], timeout=300)
            with lock:
                n_ok[0] += 1

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    t1 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t1
    st = srv.stats()
    total = args.clients * args.requests
    print(f"loaded: {total} reqs from {args.clients} clients in {dt:.2f}s "
          f"-> {total / dt:.1f} img/s served")
    print(f"  batch occupancy {st['mean_batch_occupancy']:.1f}/"
          f"{args.max_batch}, latency p50 {st['latency_ms_p50']:.0f} ms "
          f"p95 {st['latency_ms_p95']:.0f} ms")
    srv.close()


if __name__ == "__main__":
    main()
