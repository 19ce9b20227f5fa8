"""Benchmark: fused enhance+detect+NMS throughput at 640px on one TPU chip.

Measures steady-state images/sec through ONE compiled XLA graph:
letterboxed input -> lowlight_recovery (5-filter enhancement) -> YOLOv8-L
backbone + 3x AsffTribeLevel -> Detect decode -> fixed-shape NMS. This is
BASELINE.json's headline metric ("images/sec/chip at 640px fused
enhance+detect+NMS").

vs_baseline: the reference publishes no numbers (BASELINE.json published: {});
BASELINE.md's north star is ">=5x Ultralytics-on-GPU images/sec/chip". We use
100 img/s as the stand-in for Ultralytics YOLOv8-L end-to-end (preprocess+
inference+NMS) on a datacenter GPU — a generous estimate for the fp32 batch-4
configuration the reference trains with (default.yaml:7-10, amp: False) — so
vs_baseline = measured / 100.0 and the 5x target means vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_IMG_PER_SEC = 100.0


def _check_platform_alive(timeout=180):
    """Fail fast if the accelerator platform is unreachable: jax.devices()
    on a dead remote tunnel hangs FOREVER (not an error), which would hang
    the whole bench run. Probe in a bounded subprocess instead."""
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout)
        if probe.returncode == 0 and "ok" in probe.stdout:
            return
        detail = (probe.stderr or "").strip().splitlines()[-1:] or ["?"]
        raise SystemExit(f"bench: accelerator platform failed to "
                         f"initialize: {detail[0]}")
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"bench: accelerator platform unreachable (device enumeration "
            f"hung > {timeout}s — remote tunnel down?); no measurement taken")


def main():
    _check_platform_alive()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.nn.heads import decode_detections
    from dedark_yolo_tpu.ops.nms import non_max_suppression

    import os
    imgsz = 640
    # throughput-optimal on v5e (round-2 sweep with the streaming one-pass
    # enhance kernel: b256 585, b384 603, b448 570 img/s). DEDARK_BENCH_BATCH
    # overrides for sweeps (concat elision shrinks activation memory, so
    # larger batches are worth re-probing).
    batch = int(os.environ.get("DEDARK_BENCH_BATCH", 384))
    warmup, iters = 2, 6

    d = model_yaml_load("yolov8l.yaml")  # flagship: lowlight_recovery + ASFF, L
    d["nc"] = 3
    # round-3: the XLA chain with the banded-matmul USM outruns the Pallas
    # fused kernel (~9 ms vs ~30 ms enhance at b256 — the depthwise blur was
    # VPU-bound; runs/roofline.json + docs/BENCHMARKS.md round-3 notes)
    model = DetectionModel(d, enhance_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    # bf16 weights for inference (TPU-native precision; val-parity runs use fp32)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables["params"])
    batch_stats = variables["batch_stats"]

    @jax.jit
    def fused(params, batch_stats, img_u8):
        img = img_u8.astype(jnp.bfloat16) / 255.0
        v = {"params": params, "batch_stats": batch_stats}
        raw = model.module.apply(v, img, train=False)
        boxes, scores = decode_detections(raw, model.nc, model.strides,
                                          model.reg_max)
        dets, counts = non_max_suppression(
            boxes.astype(jnp.float32), scores.astype(jnp.float32),
            conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=2048,
            multi_label=False)
        return dets, counts

    # distinct input buffers per iteration: some remote-device transports dedupe
    # identical executions, which inflates throughput by >10x
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3),
                                     dtype=np.uint8)) for _ in range(4)]

    # force a small host transfer per iteration: on remote-device transports
    # block_until_ready can return before execution completes, so only a
    # device->host readback gives honest timings
    for i in range(warmup):
        dets, counts = fused(params, batch_stats, imgs[i % len(imgs)])
        np.asarray(counts)

    # steady-state pipelining, default depth 2: submit batch i+1 before
    # reading back batch i, hiding the per-call dispatch latency of the
    # remote transport. DEDARK_BENCH_DEPTH raises the in-flight window (e.g.
    # 3) to probe whether dispatch latency is still exposed at depth 2.
    # Every iteration still executes real work on a distinct buffer and every
    # output is read back, so the measurement stays honest — the wall clock
    # covers all `iters` executions end to end.
    from collections import deque
    depth = max(1, int(os.environ.get("DEDARK_BENCH_DEPTH", 2)))
    t0 = time.perf_counter()
    pending = deque()
    for i in range(iters):
        pending.append(fused(params, batch_stats, imgs[i % len(imgs)]))
        if len(pending) >= depth:
            np.asarray(pending.popleft()[1])
    while pending:
        np.asarray(pending.popleft()[1])
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    rec = {
        "metric": "images/sec/chip fused enhance+detect+NMS @640 bf16 (Dedark-YOLOv8L+ASFF); vs_baseline divides by a 100 img/s GPU STAND-IN (assumed; reference publishes no number)",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 3),
    }
    # second, MEASURED anchor: the full reference stack on THIS host (torch
    # CPU, flagship 640 fp32, its own predict-phase timers) — produced by
    # scripts/reference_speed.py (VERDICT r3 next #3)
    ref_json = Path(__file__).parent / "runs/refspeed.json"
    if ref_json.is_file():
        ref = json.loads(ref_json.read_text())
        ref_ips = float(ref.get("predict_img_per_s") or 0)
        if ref_ips > 0:
            rec["vs_measured_reference_cpu"] = round(ips / ref_ips, 1)
            rec["measured_reference_cpu_img_per_s"] = ref_ips
            rec["metric"] += (f"; vs_measured_reference_cpu divides by the "
                              f"MEASURED {ref_ips} img/s of the reference "
                              f"stack on this host (torch CPU predict, "
                              f"runs/refspeed.json)")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
