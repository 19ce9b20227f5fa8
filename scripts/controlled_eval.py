"""Post-hoc controlled-exposure evaluation for the v2 realimage runs.

Exposure jitter on the val split confounds crush severity (a gain-1.25 scene
crushed at img**5 keeps detectable structure; a gain-0.7 scene does not), so
severity claims are made on CONTROLLED val splits: regenerated with
``val_jitter=False`` (train images bit-identical — the rng draw stream is
aligned), then crushed at a fixed severity. Every trained model from the v2
campaign is valed on the matching controlled split; results land in
``runs/controlled_eval.json`` and the table in docs/REALIMAGE.md.

Reference context: the reference evaluates on whatever darkness its offline
maker produced (utils/lowlight_process.py) — a fixed-exposure protocol; this
reproduces that protocol on the derived corpus.

Usage:
    python scripts/controlled_eval.py
"""
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))
from realimage_run import build_dataset, degrade_split  # noqa: E402
from dedark_yolo_tpu import YOLO  # noqa: E402

results = {}
OUT = REPO / "runs" / "controlled_eval.json"


def controlled_val(dark):
    """Dataset whose val split has controlled exposure, crushed at `dark`
    (0 = clean). Cached under /tmp/ctrl_eval between invocations."""
    root = Path(f"/tmp/ctrl_eval/d{dark}")
    if not (root / "data.yaml").exists():
        build_dataset(root, val_jitter=False)
        shutil.rmtree(root / "images" / "train")  # val-only; labels kept
        (root / "images" / "train").mkdir()
        if dark:
            degrade_split(root, "val", dark)
    return str(root / "data.yaml")


def val(tag, ckpt, data):
    if not Path(ckpt).exists():
        print(f"skip {tag}: no {ckpt}", flush=True)
        return
    m = YOLO(ckpt)
    r = m.val(data=data, imgsz=320, max_det=30, max_nms=512, plots=False)
    results[tag] = {k.split("/")[-1]: round(float(v), 4) for k, v in r.items()
                    if isinstance(v, (int, float))}
    print(tag, results[tag], flush=True)
    OUT.write_text(json.dumps(results, indent=1))  # persist incrementally


R = REPO / "runs"
clean = controlled_val(0)
d5 = controlled_val(5.0)

val("control_on_clean", f"{R}/realimage_v2_control/train/weights/best.npz",
    clean)
val("control_on_d5", f"{R}/realimage_v2_control/train/weights/best.npz", d5)
val("dedark80_on_d5", f"{R}/realimage_v2/train/weights/best.npz", d5)

for D in ("3.0", "5.0", "7.5"):
    data_d = controlled_val(float(D))
    if f"control_on_d{D}" not in results and D != "5.0":
        val(f"control_on_d{D}",
            f"{R}/realimage_v2_control/train/weights/best.npz", data_d)
    val(f"sweep{D}_on_d{D}",
        f"{R}/realimage_v2_d{D}/train/weights/best.npz", data_d)

val("dedark160_on_d5", f"{R}/realimage_v2_long/train/weights/best.npz", d5)

print("DONE")
