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


def main():
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
    d, f = rec["default"], rec["float32"]
    if d["val_wall_s"]:
        rec["float32_cost_x"] = round(f["val_wall_s"] / d["val_wall_s"], 2)
    out = REPO / "runs/precision_ab.json"
    out.write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
