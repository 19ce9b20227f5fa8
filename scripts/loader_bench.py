"""Host input-pipeline throughput vs device demand (VERDICT round-1 item 10).

Measures, on this host:
  1. native decode+letterbox (the whole predict/val preprocess) img/s at 640;
  2. native letterbox-only img/s (pre-decoded frames, e.g. video);
  3. train DataLoader (mosaic4 + affine + HSV + flips) img/s, cold and
     RAM-cached;
and prints them against the measured device consumption (bench.py's img/s).

Usage: python scripts/loader_bench.py [--imgsz 640] [--n 64]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BUS = Path("/root/reference/bus.jpg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--device-img-s", type=float, default=554.0,
                    help="device consumption at b256 (BENCH json)")
    args = ap.parse_args()

    import cv2
    from dedark_yolo_tpu import native

    assert native.available(), "native core failed to build"
    src = cv2.imread(str(BUS))
    assert src is not None

    # a folder of distinct jpegs (sliced from the one real photo we have)
    import tempfile
    tmp = Path(tempfile.mkdtemp())
    rng = np.random.default_rng(0)
    paths = []
    for i in range(args.n):
        y = int(rng.integers(0, 200))
        crop = src[y:y + 880, :, :]
        p = tmp / f"im{i}.jpg"
        cv2.imwrite(str(p), crop)
        paths.append(str(p))

    s = args.imgsz

    # 1. decode + letterbox (full predict preprocess)
    native.decode_letterbox_batch(paths[:2], s)  # warm
    t0 = time.perf_counter()
    batch, shapes = native.decode_letterbox_batch(paths, s)
    dt = time.perf_counter() - t0
    r_decode_lb = args.n / dt
    print(f"native decode+letterbox @{s}: {r_decode_lb:.1f} img/s "
          f"({dt / args.n * 1000:.2f} ms/img)")

    # 2. letterbox only (frames already in memory)
    frames = [cv2.imread(p) for p in paths]
    native.letterbox_batch(frames[:2], s)
    t0 = time.perf_counter()
    native.letterbox_batch(frames, s)
    dt = time.perf_counter() - t0
    r_lb = args.n / dt
    print(f"native letterbox-only @{s}:  {r_lb:.1f} img/s "
          f"({dt / args.n * 1000:.2f} ms/img)")

    # 3. train loader (mosaic pipeline), cold vs RAM-cached
    from dedark_yolo_tpu.data import YOLODataset, DataLoader, TrainTransforms
    lbl = tmp / "labels"
    img_dir = tmp / "images" / "train"
    img_dir.mkdir(parents=True)
    (tmp / "labels" / "train").mkdir(parents=True)
    for i, p in enumerate(paths):
        Path(p).rename(img_dir / Path(p).name)
        (tmp / "labels" / "train" / f"im{i}.txt").write_text(
            "0 0.5 0.5 0.3 0.3\n")
    hyp = {"mosaic": 1.0, "mixup": 0.0, "fliplr": 0.5, "translate": 0.1,
           "scale": 0.5}
    for cache, tag in ((False, "cold"), (True, "RAM-cached")):
        ds = YOLODataset(str(img_dir), imgsz=s, nc=1, cache=cache)
        dl = DataLoader(ds, TrainTransforms(hyp, imgsz=s), batch_size=8,
                        max_boxes=16, workers=8)
        n_img = 0
        t0 = time.perf_counter()
        for b in dl:
            n_img += b["img"].shape[0]
        dt = time.perf_counter() - t0
        if cache:  # second pass measures the cached steady state
            n_img = 0
            t0 = time.perf_counter()
            for b in dl:
                n_img += b["img"].shape[0]
            dt = time.perf_counter() - t0
        print(f"train loader (mosaic, {tag}) @{s}: {n_img / dt:.1f} img/s")

    print(f"device consumption at b256 (bench.py): {args.device_img_s:.0f} img/s")
    cores_needed = args.device_img_s / r_decode_lb
    print(f"host cores needed to saturate one chip (predict path): "
          f"~{cores_needed:.1f} (the native pool scales per core; this host "
          f"has {__import__('os').cpu_count()})")


if __name__ == "__main__":
    main()
