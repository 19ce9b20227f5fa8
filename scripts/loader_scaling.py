"""Train input-pipeline scaling study (VERDICT r4 #4).

Answers: can the host loader feed the chip's measured train-step demand
(142.6 img/s at b48 @640), and with how many cores?

The reference scales its input pipeline with multi-process torch DataLoader
workers (reference data/build.py:93-109). Our default is a thread pool —
valid only if cv2/numpy release the GIL for the heavy kernels — with a
fork-start process pool behind `loader_mp` (data/loader.py). This host has a
SINGLE core, so a workers-vs-throughput curve cannot show scaling directly;
instead we measure the quantities that determine it:

  1. T1: single-worker mosaic4+affine+HSV+flip throughput at 640 (img/s);
  2. the GIL-HOLD fraction of the transform: a pure-Python counter thread
     runs beside one transform worker; its slowdown vs solo equals the share
     of transform wall-time spent holding the GIL. Thread workers can scale
     to at most ~1/hold_fraction cores before serializing on the GIL
     (Amdahl over the GIL-held span); process workers have no such cap.
  3. per-mode overhead at workers=1 and 2 on this 1-core host (process IPC
     pickling cost shows up directly as T1_mp / T1 < 1).

Projection printed (and saved to runs/loader_scaling.json):
  cores_to_saturate_threads / _processes for the 142.6 img/s train demand.

Usage: python scripts/loader_scaling.py [--imgsz 640] [--seconds 20]
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

TRAIN_DEMAND = 152.3  # img/s, round-5 train step (stem_s2d + fpn_fuse,
                      # docs/BENCHMARKS.md round-5 table)


def build_corpus(root, imgsz, n=64):
    """640-px corpus from the one real photo (distinct crops, like
    scripts/loader_bench.py) so decode+augment cost is realistic."""
    import cv2
    root.mkdir(parents=True, exist_ok=True)
    src = cv2.imread("/root/reference/bus.jpg")
    assert src is not None
    rng = np.random.default_rng(0)
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        y = int(rng.integers(0, 200))
        x = int(rng.integers(0, 120))
        crop = src[y:y + 880, x:x + 690]
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), crop)
        k = int(rng.integers(1, 4))
        rows = [f"{int(rng.integers(0, 3))} "
                f"{rng.uniform(0.3, 0.7):.4f} {rng.uniform(0.3, 0.7):.4f} "
                f"{rng.uniform(0.1, 0.3):.4f} {rng.uniform(0.1, 0.3):.4f}"
                for _ in range(k)]
        (lbl_dir / f"im{i}.txt").write_text("\n".join(rows) + "\n")
    import yaml
    yp = root / "data.yaml"
    yp.write_text(yaml.safe_dump(
        {"path": str(root), "train": "images/train", "val": "images/train",
         "nc": 3, "names": {0: "a", 1: "b", 2: "c"}}, sort_keys=False))
    return yp


def measure_loader(ds, tf, workers, use_processes, seconds, imgsz):
    from dedark_yolo_tpu.data.loader import DataLoader
    dl = DataLoader(ds, tf, batch_size=8, max_boxes=32, seed=0,
                    workers=workers, use_processes=use_processes)
    try:
        # warmup epoch fragment (cv2 lazy init, RAM cache fill, pool fork)
        for bi, _ in enumerate(dl):
            if bi >= 2:
                break
        n_img = 0
        t0 = time.perf_counter()
        epoch = 1
        while time.perf_counter() - t0 < seconds:
            dl.set_epoch(epoch)
            epoch += 1
            for b in dl:
                n_img += b["img"].shape[0]
                if time.perf_counter() - t0 >= seconds:
                    break
        return n_img / (time.perf_counter() - t0)
    finally:
        dl.close()


def gil_hold_fraction(ds, tf, seconds):
    """Two estimators that BRACKET the transform's GIL-held share on a
    single-core host (neither is exact there: CPU timeslicing and GIL
    arbitration are conflated when the two threads share one core).

    (a) counter-thread share — UPPER bound on holding: a pure-Python
        increment loop beside one transform worker; its slowdown vs solo
        includes both GIL-held spans and plain CPU loss to released-GIL cv2
        kernels, so true hold <= this.
    (b) sleep-latency — closer to true holding: a monitor thread sleeps
        0.5 ms in a loop; each wake must re-acquire the GIL, so wake excess
        beyond the solo-calibrated baseline accumulates only while some
        other thread HOLDS the GIL (a released-GIL cv2 kernel lets the
        fresh-woken sleeper preempt and acquire immediately).
    """
    import random as _random

    def count(stop, out):
        c = 0
        while not stop["f"]:
            c += 1
        out["c"] = c

    def sleeper(stop, out, interval=0.0005):
        excess = 0.0
        t_prev = time.perf_counter()
        while not stop["f"]:
            time.sleep(interval)
            now = time.perf_counter()
            excess += max(0.0, (now - t_prev) - interval)
            t_prev = now
        out["excess"] = excess

    def run_beside(worker_factory, run_transform):
        stop, out = {"f": False}, {}
        t = threading.Thread(target=worker_factory, args=(stop, out))
        t.start()
        t0 = time.perf_counter()
        n = 0
        if run_transform:
            i = 0
            while time.perf_counter() - t0 < seconds:
                tf(ds, i % len(ds), _random.Random(i))
                n += 1
                i += 1
        else:
            time.sleep(seconds)
        el = time.perf_counter() - t0
        stop["f"] = True
        t.join()
        return out, el, n

    out, el, _ = run_beside(count, False)
    solo_rate = out["c"] / el
    out, el, n_items = run_beside(count, True)
    hold_upper = max(0.0, 1.0 - (out["c"] / el) / solo_rate)
    t1_contended = n_items / el

    out, el, _ = run_beside(sleeper, False)
    base_excess = out["excess"] / el
    out, el, _ = run_beside(sleeper, True)
    hold_sleep = max(0.0, out["excess"] / el - base_excess)
    return hold_upper, min(hold_sleep, hold_upper), t1_contended


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--out", default=str(REPO / "runs/loader_scaling.json"))
    args = ap.parse_args()

    import tempfile
    from dedark_yolo_tpu.data.dataset import YOLODataset
    from dedark_yolo_tpu.data.augment import TrainTransforms

    root = Path(tempfile.mkdtemp(prefix="loader_scaling_"))
    build_corpus(root, args.imgsz)
    hyp = {"mosaic": 1.0, "mixup": 0.0, "copy_paste": 0.0, "hsv_h": 0.015,
           "hsv_s": 0.7, "hsv_v": 0.4, "degrees": 0.0, "translate": 0.1,
           "scale": 0.5, "shear": 0.0, "perspective": 0.0, "flipud": 0.0,
           "fliplr": 0.5, "photometric": 0.0}
    ds = YOLODataset(str(root / "images/train"), imgsz=args.imgsz, nc=3,
                     cache="ram")
    tf = TrainTransforms(hyp, imgsz=args.imgsz)

    rec = {"imgsz": args.imgsz, "host_cores": __import__("os").cpu_count(),
           "train_demand_img_s": TRAIN_DEMAND}

    for mode, use_p in (("threads", False), ("processes", True)):
        for w in (1, 2):
            ips = measure_loader(ds, tf, w, use_p, args.seconds, args.imgsz)
            rec[f"{mode}_w{w}_img_s"] = round(ips, 1)

    hold_upper, hold_sleep, _ = gil_hold_fraction(ds, tf, args.seconds)
    rec["gil_hold_upper"] = round(hold_upper, 3)
    rec["gil_hold_sleep_est"] = round(hold_sleep, 3)

    t1 = rec["threads_w1_img_s"]
    mp_eff = rec["processes_w1_img_s"] / max(t1, 1e-9)
    rec["process_worker_efficiency"] = round(mp_eff, 3)
    # Amdahl over the GIL-held span: N thread workers serialize on hold*T
    # per item, so aggregate thread throughput caps at T1/hold. The two hold
    # estimates bracket the true ceiling.
    rec["thread_ceiling_img_s_pessimistic"] = round(
        t1 / max(hold_upper, 1e-3), 1)
    rec["thread_ceiling_img_s_optimistic"] = round(
        t1 / max(hold_sleep, 1e-3), 1)
    rec["cores_to_saturate_processes"] = int(
        np.ceil(TRAIN_DEMAND / max(rec["processes_w1_img_s"], 1e-9)))
    # threads saturate only if the PESSIMISTIC ceiling clears the demand;
    # None = cannot conclude threads suffice -> use loader_mp on big hosts
    rec["cores_to_saturate_threads"] = (
        int(np.ceil(TRAIN_DEMAND / max(t1, 1e-9)))
        if rec["thread_ceiling_img_s_pessimistic"] >= TRAIN_DEMAND else None)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
