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
import os
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


def _train_ips_subprocess(timeout=1500):
    """Run the train-step measurement in a CLEAN subprocess (before the
    parent touches the TPU): b48 @640 flagship sits near the HBM ceiling
    (b64 OOMs, docs/BENCHMARKS.md round-4 A/B), so it cannot share the chip
    with the inference bench's b384 staging buffers + executables — measuring
    in the same process RESOURCE_EXHAUSTs. Returns img/s (float) or raises."""
    import subprocess
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve()), "--train-ips"],
        capture_output=True, text=True, timeout=timeout)
    for line in (proc.stdout or "").splitlines():
        if line.startswith("TRAIN_IPS "):
            return float(line.split()[1])
    tail = ((proc.stderr or "").strip().splitlines() or ["?"])[-1]
    raise RuntimeError(f"train bench subprocess rc={proc.returncode}: {tail[:160]}")


def _train_ips(batch=48, imgsz=640, iters=4, max_boxes=32, stem_s2d=None):
    """Train-step img/s on the flagship graph (the SECOND headline number):
    the full fused flat-master production step (degrade -> enhance -> forward
    -> TAL loss -> grads -> fused SGD+EMA on donated buffers), b48 @640 bf16 —
    the confirmed single-chip optimum (docs/BENCHMARKS.md round-4 remat A/B).
    Same honest protocol: distinct device-staged buffers, per-iter readback.
    Runs via _train_ips_subprocess so it owns the whole chip's HBM."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.losses import detection_loss
    from dedark_yolo_tpu.engine.optim import (flat_spec, flatten_for_opt,
                                              fused_ema_update,
                                              fused_init_opt_state,
                                              fused_opt_update_flat,
                                              label_params,
                                              make_unflatten_diff,
                                              tree_to_flat)
    from dedark_yolo_tpu.ops.degrade import lowlight_degrade

    # defaults mirror the trainer's shipping configuration (stem_s2d +
    # fpn_fuse on: +1.9% / +1.6% measured — runs/{stem,fpn}_ab.json);
    # DEDARK_BENCH_S2D=0 / DEDARK_FPN_FUSE=0 for the A/Bs
    if stem_s2d is None:
        stem_s2d = os.environ.get("DEDARK_BENCH_S2D", "1") == "1"
    fpn_fuse = os.environ.get("DEDARK_FPN_FUSE", "1") == "1"
    d = model_yaml_load("yolov8l.yaml")
    d["nc"] = 3
    model = DetectionModel(d, stem_s2d=stem_s2d, fpn_fuse=fpn_fuse)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    params, batch_stats = variables["params"], variables["batch_stats"]
    spec = flatten_for_opt(params, label_params(params))
    bspec = flat_spec(batch_stats)
    unflat = make_unflatten_diff(spec)
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 2.0}

    def loss_fn(params, batch_stats, batch):
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)
        clean = batch["img"].astype(jnp.float32) / 255.0
        img = lowlight_degrade(clean, 5.0)
        v = {"params": params, "batch_stats": batch_stats}
        raw, new_stats = model.apply_train(v, img.astype(jnp.bfloat16),
                                           None, None)
        raw = jax.tree_util.tree_map(lambda r: r.astype(jnp.float32), raw)
        lbatch = {"cls": batch["cls"], "bboxes": batch["bboxes"],
                  "mask_gt": batch["mask_gt"],
                  "recovery_loss": jnp.mean((img - clean) ** 2)}
        total, items = detection_loss(raw, lbatch, nc=model.nc,
                                      strides=model.strides, hyp=hyp)
        return total, (items, new_stats)

    def train_step(p_flat, batch_stats, opt_state, ema, ema_updates, batch):
        (total, (items, new_stats)), g_flat = jax.value_and_grad(
            lambda pf, bs, b: loss_fn(unflat(pf), bs, b),
            has_aux=True)(p_flat, batch_stats, batch)
        p_flat, opt_state, applied = fused_opt_update_flat(
            p_flat, g_flat, opt_state, kind="sgd",
            lr_bias=jnp.float32(0.01), lr=jnp.float32(0.01),
            momentum=jnp.float32(0.937), accumulate=1)
        ema_p, ema_b, ema_updates = fused_ema_update(
            ema["params"], ema["batch_stats"], p_flat,
            tree_to_flat(new_stats, bspec), ema_updates, applied)
        return (p_flat, new_stats, opt_state,
                {"params": ema_p, "batch_stats": ema_b}, ema_updates, total)

    step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))
    rng = np.random.default_rng(0)
    batches = jax.device_put([{
        "img": rng.integers(0, 255, (batch, imgsz, imgsz, 3)).astype(np.uint8),
        "bboxes": rng.uniform(0.2, 0.7, (batch, max_boxes, 4)).astype(np.float32),
        "cls": rng.integers(0, 3, (batch, max_boxes)).astype(np.float32),
        "mask_gt": np.ones((batch, max_boxes), np.float32),
    } for _ in range(2)])
    jax.block_until_ready(batches)
    p, bs = tree_to_flat(params, spec), batch_stats
    opt = fused_init_opt_state(params, spec)
    ema = {"params": tree_to_flat(params, spec),
           "batch_stats": tree_to_flat(batch_stats, bspec)}
    eu = jnp.zeros((), jnp.int32)
    for i in range(3):  # compile + warmup
        p, bs, opt, ema, eu, total = step(p, bs, opt, ema, eu, batches[i % 2])
        float(total)
    t0 = time.perf_counter()
    for i in range(iters):
        p, bs, opt, ema, eu, total = step(p, bs, opt, ema, eu, batches[i % 2])
        float(total)  # per-iteration readback
    return batch * iters / (time.perf_counter() - t0)


def main():
    _check_platform_alive()
    # second headline: TRAIN-step throughput (VERDICT r4 #8 — BENCH carries
    # both). Measured FIRST, in a clean subprocess, before this process
    # initializes the TPU (see _train_ips_subprocess). Guarded: a train
    # failure must never lose the inference record.
    train_ips = train_err = None
    if os.environ.get("DEDARK_BENCH_TRAIN", "1") != "0":
        try:
            train_ips = _train_ips_subprocess()
        except Exception as e:  # noqa: BLE001 — report, don't fail the bench
            train_err = f"{type(e).__name__}: {str(e)[:160]}"
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.nn.heads import decode_detections
    from dedark_yolo_tpu.ops.nms import non_max_suppression

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
    if train_ips is not None:
        rec["train_img_per_s"] = round(train_ips, 1)
        rec["metric"] += ("; train_img_per_s is the full fused train "
                          "step (b48 @640 bf16, flagship)")
    elif train_err is not None:
        rec["train_bench_error"] = train_err
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--train-ips" in sys.argv:
        print(f"TRAIN_IPS {_train_ips():.2f}", flush=True)
    else:
        main()
