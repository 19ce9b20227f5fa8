"""A/B: FPN top-down fuse (LazyUp upsample-commute) off/on, real chip
(VERDICT r4 #2 — the round-3 roofline's 47%-of-peak top-down stage).

Runs bench.py's inference measurement in subprocesses with
DEDARK_FPN_FUSE=0/1 (DetectionModel reads the env default), then the train
step the same way. Writes runs/fpn_ab.json.

Usage: python scripts/fpn_ab.py [--skip-train]
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_infer(fuse, timeout=2400):
    env = dict(os.environ, DEDARK_BENCH_TRAIN="0",
               DEDARK_FPN_FUSE="1" if fuse else "0")
    proc = subprocess.run([sys.executable, str(REPO / "bench.py")],
                          capture_output=True, text=True, timeout=timeout,
                          env=env)
    for line in (proc.stdout or "").splitlines():
        if line.startswith("{"):
            return json.loads(line)["value"]
    tail = ((proc.stderr or "").strip().splitlines() or ["?"])[-1]
    raise RuntimeError(f"infer fuse={fuse}: rc={proc.returncode}: {tail[:200]}")


def run_train(fuse, timeout=2400):
    env = dict(os.environ, DEDARK_FPN_FUSE="1" if fuse else "0")
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--train-ips"],
        capture_output=True, text=True, timeout=timeout, env=env)
    for line in (proc.stdout or "").splitlines():
        if line.startswith("TRAIN_IPS "):
            return float(line.split()[1])
    tail = ((proc.stderr or "").strip().splitlines() or ["?"])[-1]
    raise RuntimeError(f"train fuse={fuse}: rc={proc.returncode}: {tail[:200]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--out", default=str(REPO / "runs/fpn_ab.json"))
    args = ap.parse_args()
    rec = {}
    jobs = [("infer_base_img_s", run_infer, False),
            ("infer_fuse_img_s", run_infer, True)]
    if not args.skip_train:
        jobs += [("train_base_img_s", run_train, False),
                 ("train_fuse_img_s", run_train, True)]
    for key, fn, fuse in jobs:
        try:
            rec[key] = round(fn(fuse), 1)
        except Exception as e:  # noqa: BLE001
            rec[key] = f"ERROR {type(e).__name__}: {str(e)[:160]}"
        print(key, rec[key], flush=True)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
