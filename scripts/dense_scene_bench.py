"""Dense-scene train-step scaling: step time vs the label ceiling M
(VERDICT r4 #7).

The TAL assigner works over a static (B, M, N) grid (losses/tal.py), so its
cost grows ~linearly in M (with a chunked top-k over N per GT row). Auto
max_boxes (max_boxes=0) sizes M to the dataset; this chart shows what a
dense corpus (50-200 objects/image -> M in the hundreds after mosaic) costs
on-chip, and that sparse datasets (M=16-32) pay nothing for the dense-path
generality. Reference comparison point: the torch fork pads per-batch
dynamically (loss.py:124-139) and re-kernels per shape; here every M is one
static compile.

Runs the FULL fused flagship train step (bench.py _train_ips) at each M.
Usage: python scripts/dense_scene_bench.py [--batch 16] [--imgsz 640]
Writes runs/dense_scene_bench.json; table belongs in docs/BENCHMARKS.md.
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (repo-root bench.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="smaller than the b48 optimum so M=1024's (B,M,N) "
                         "buffers fit HBM next to the model state")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--m", type=int, nargs="+",
                    default=[32, 128, 256, 512, 1024])
    ap.add_argument("--out", default=str(REPO / "runs/dense_scene_bench.json"))
    args = ap.parse_args()

    rows = []
    for m in args.m:
        try:
            ips = bench._train_ips(batch=args.batch, imgsz=args.imgsz,
                                   iters=args.iters, max_boxes=m)
            ms = args.batch / ips * 1000.0
            rows.append({"max_boxes": m, "img_per_s": round(ips, 1),
                         "ms_per_step": round(ms, 1)})
            print(f"M={m:5d}: {ips:7.1f} img/s  ({ms:.1f} ms/step)",
                  flush=True)
        except Exception as e:  # OOM at the top end is a finding, not a crash
            rows.append({"max_boxes": m,
                         "error": f"{type(e).__name__}: {str(e)[:120]}"})
            print(f"M={m:5d}: {type(e).__name__}", flush=True)
    rec = {"batch": args.batch, "imgsz": args.imgsz, "rows": rows}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
