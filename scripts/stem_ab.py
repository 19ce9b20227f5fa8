"""A/B: space-to-depth stem vs baseline stem, on the real chip
(VERDICT r4 #1 — test the round-4 'not addressable without custom stem
kernels' claim).

Train side: the full fused flagship train step (bench._train_ips) at
b48 @640 bf16 with stem_s2d off/on. Inference side: the fused
enhance+detect+NMS graph at b384 @640 bf16 off/on (same honest protocol as
bench.py: distinct buffers, per-iter readback, depth-2 pipeline).

Each measurement runs in its OWN subprocess so HBM never carries two
programs (the b48 train step alone sits near the ceiling).

Usage: python scripts/stem_ab.py [--skip-infer] [--skip-train]
Writes runs/stem_ab.json.
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_one(kind, s2d, timeout=2400):
    code = f"""
import sys, time
sys.path.insert(0, {str(REPO)!r})
import bench
if {kind!r} == "train":
    ips = bench._train_ips(stem_s2d={s2d!r} == "1")
else:
    import os
    os.environ["DEDARK_BENCH_TRAIN"] = "0"
    import jax, numpy as np
    import jax.numpy as jnp
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.nn.heads import decode_detections
    from dedark_yolo_tpu.ops.nms import non_max_suppression
    batch, imgsz = 384, 640
    d = model_yaml_load("yolov8l.yaml"); d["nc"] = 3
    model = DetectionModel(d, enhance_impl="xla", stem_s2d={s2d!r} == "1")
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables["params"])
    batch_stats = variables["batch_stats"]
    @jax.jit
    def fused(params, batch_stats, img_u8):
        img = img_u8.astype(jnp.bfloat16) / 255.0
        v = {{"params": params, "batch_stats": batch_stats}}
        raw = model.module.apply(v, img, train=False)
        boxes, scores = decode_detections(raw, model.nc, model.strides,
                                          model.reg_max)
        return non_max_suppression(
            boxes.astype(jnp.float32), scores.astype(jnp.float32),
            conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=2048,
            multi_label=False)
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3),
                                     dtype=np.uint8)) for _ in range(4)]
    for i in range(2):
        np.asarray(fused(params, batch_stats, imgs[i % 4])[1])
    from collections import deque
    iters, depth = 6, 2
    t0 = time.perf_counter()
    pending = deque()
    for i in range(iters):
        pending.append(fused(params, batch_stats, imgs[i % 4]))
        if len(pending) >= depth:
            np.asarray(pending.popleft()[1])
    while pending:
        np.asarray(pending.popleft()[1])
    ips = batch * iters / (time.perf_counter() - t0)
print("RESULT_IPS", ips)
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=timeout)
    for line in (proc.stdout or "").splitlines():
        if line.startswith("RESULT_IPS "):
            return float(line.split()[1])
    tail = ((proc.stderr or "").strip().splitlines() or ["?"])[-1]
    raise RuntimeError(f"{kind} s2d={s2d}: rc={proc.returncode}: {tail[:200]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-infer", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--out", default=str(REPO / "runs/stem_ab.json"))
    args = ap.parse_args()
    rec = {}
    jobs = []
    if not args.skip_train:
        jobs += [("train", "0"), ("train", "1")]
    if not args.skip_infer:
        jobs += [("infer", "0"), ("infer", "1")]
    for kind, s2d in jobs:
        key = f"{kind}_{'s2d' if s2d == '1' else 'base'}_img_s"
        try:
            rec[key] = round(run_one(kind, s2d), 1)
        except Exception as e:  # noqa: BLE001 — record, continue the sweep
            rec[key] = f"ERROR {type(e).__name__}: {str(e)[:160]}"
        print(key, rec[key], flush=True)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
