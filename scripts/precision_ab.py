"""Measure the matmul_precision serving knob (VERDICT r4 #6).

The flagship TPU duel showed Δ mAP50 = 0.0056 vs the torch-fp32 reference
because XLA computes fp32 convs with bf16 MXU input passes by default
(docs/PARITY.md). cfg `matmul_precision: float32` forces fp32-accurate
multi-pass matmuls — the on-chip equivalent of the reference's forced fp32
val (reference validator.py:106). This script runs the SAME flagship val on
the real chip at each setting and records mAP50 + wall time, turning the
0.0056 gap into a documented, priced user choice.

Usage: python scripts/precision_ab.py  (on the TPU; ~10 min/setting)
Writes runs/precision_ab.json; numbers belong in docs/PARITY.md.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CKPT = REPO / "runs/realimage_flagship/train2/weights/best.npz"
DATA = REPO / "runs/refduel/data_abs.yaml"


def ref_fp32_map50():
    """The reference validator's torch-CPU fp32 mAP50 for the SAME ckpt,
    from the duel artifact (scripts/reference_duel.py writes it)."""
    duel = json.loads((REPO / "runs/refduel/duel.json").read_text())
    assert duel["config"]["ckpt"].endswith(str(CKPT.relative_to(REPO))), \
        f"duel.json was produced with {duel['config']['ckpt']}, not {CKPT}"
    return duel["reference"]["map50"]


def steady_state_speed(prec, batch=16, iters=8):
    """Steady-state fp32 forward img/s at a given matmul precision —
    the 64-image val wall is compile-dominated, so the throughput price of
    `float32` is measured here instead (honest-timing rules of
    docs/BENCHMARKS.md: distinct buffers, per-iteration readback)."""
    import subprocess
    import sys as _sys
    code = f"""
import sys, time
sys.path.insert(0, {str(REPO)!r})
import jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_default_matmul_precision",
                  None if {prec!r} == "default" else {prec!r})
from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn.graph import DetectionModel
d = model_yaml_load("yolov8l.yaml"); d["nc"] = 3
model = DetectionModel(d, enhance_impl="xla")
v = model.init(jax.random.PRNGKey(0), imgsz=640)
fn = jax.jit(lambda var, x: model.apply_eval(var, x))
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.uniform(0, 1, ({batch}, 640, 640, 3)), jnp.float32)
      for _ in range(3)]
b, s = fn(v, xs[0]); float(np.asarray(s)[0, 0, 0])   # compile
t0 = time.perf_counter()
for i in range({iters}):
    b, s = fn(v, xs[i % 3] + i * 1e-6)
    float(np.asarray(s)[0, 0, 0])
print("IPS", {batch} * {iters} / (time.perf_counter() - t0))
"""
    proc = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1800)
    for line in (proc.stdout or "").splitlines():
        if line.startswith("IPS"):
            return float(line.split()[1])
    raise RuntimeError((proc.stderr or "?").strip()[-500:])


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed-only", action="store_true",
                    help="only refresh the steady-state speed rows in an "
                         "existing runs/precision_ab.json")
    args = ap.parse_args()

    out = REPO / "runs/precision_ab.json"
    if args.speed_only:
        rec = json.loads(out.read_text())
        for prec in ("default", "float32"):
            rec.setdefault(prec, {})["fp32_fwd_img_s"] = round(
                steady_state_speed(prec), 1)
            print(prec, rec[prec], flush=True)
        rec["float32_cost_x"] = round(
            rec["default"]["fp32_fwd_img_s"]
            / rec["float32"]["fp32_fwd_img_s"], 2)
        out.write_text(json.dumps(rec, indent=1))
        print(json.dumps(rec))
        return

    from dedark_yolo_tpu import YOLO

    ref50 = ref_fp32_map50()
    rec = {"ref_fp32_map50": ref50}
    for prec in ("default", "float32"):
        m = YOLO(str(CKPT))
        t0 = time.perf_counter()
        res = m.val(data=str(DATA), imgsz=640, batch=16, rect=False,
                    plots=False, conf=0.001, iou=0.7, max_det=300,
                    contrast_mode="reference", matmul_precision=prec,
                    project="runs/precision_ab", name=prec, exist_ok=True)
        dt = time.perf_counter() - t0
        map50 = float(res["metrics/mAP50(B)"])
        rec[prec] = {"map50": map50,
                     "delta_vs_ref_fp32": round(map50 - ref50, 6),
                     "val_wall_s": round(dt, 1)}
        print(prec, rec[prec], flush=True)
    # val_wall_s on a 64-image corpus is compile-dominated; the throughput
    # price comes from the steady-state probe (--speed-only pass)
    for prec in ("default", "float32"):
        rec[prec]["fp32_fwd_img_s"] = round(steady_state_speed(prec), 1)
    rec["float32_cost_x"] = round(
        rec["default"]["fp32_fwd_img_s"] / rec["float32"]["fp32_fwd_img_s"], 2)
    out.write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
