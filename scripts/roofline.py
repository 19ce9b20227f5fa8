"""Per-stage roofline for the flagship inference graph (VERDICT r2 next #5).

Times stage PREFIXES of the fused bench graph on the real chip (the `upto`
truncation in YOLOGraph.__call__), differences them into per-stage ms, pulls
per-prefix FLOPs from XLA's compiled cost analysis, estimates per-stage HBM
traffic (activations in/out + weights, bf16), and reports each stage against
its compute/bandwidth bound on one v5e chip.

Honest-timing rules for the axon transport (docs/BENCHMARKS.md): distinct
input buffers per iteration + a tiny per-iteration readback; stage times come
from prefix differences so the ~30 ms dispatch overhead cancels.

Usage:  python scripts/roofline.py [--batch 256] [--iters 8] [--imgsz 640]
Writes: runs/roofline.json + a markdown table on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e, one chip: bf16 peak and HBM bandwidth (public TPU v5e specs)
PEAK_FLOPS = 197e12
PEAK_BW = 819e9

# stage boundaries in the flagship yolov8.yaml graph (layer index -> name)
STAGES = [
    (0, "enhance (lowlight_recovery)"),
    (3, "backbone P1-P2 (conv 3->64->128 + C2f)"),
    (5, "backbone P3 (conv 256 + 6xC2f)"),
    (7, "backbone P4 (conv 512 + 6xC2f)"),
    (10, "backbone P5 + SPPF (conv 1024 + 3xC2f)"),
    (16, "FPN top-down (2x upsample+concat+C2f)"),
    (22, "FPN bottom-up (2x conv-s2+concat+C2f)"),
    (25, "ASFF fusion x3"),
    (26, "Detect head (raw maps)"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--json-out", default="runs/roofline.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel

    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8.yaml")
    d["scale"] = "l"
    model = DetectionModel(d, enhance_impl="pallas")
    print("init params...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), imgsz=args.imgsz)
    bf16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                  variables["params"])
    variables = {"params": bf16, "batch_stats": variables["batch_stats"]}

    b, s = args.batch, args.imgsz
    rng = np.random.default_rng(0)
    # one pre-staged buffer (uploads are ~40 MB/s on the tunnel); per-iter
    # distinctness comes from the on-device eps nudge in fwd()
    base = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)))

    results = []
    prev_ms, prev_flops = 0.0, 0.0
    for upto, name in STAGES:
        def fwd(x, eps, _upto=upto):
            y = model.module.apply(variables, (x + eps).astype(jnp.bfloat16),
                                   train=False, upto=_upto)
            # FULL reduce: a sliced readback would let XLA dead-code-eliminate
            # most of the prefix and fake the timing
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(y))

        jf = jax.jit(fwd)
        flops = None
        try:
            an = jf.lower(base, jnp.float32(0)).compile().cost_analysis()
            if an:
                a0 = an[0] if isinstance(an, (list, tuple)) else an
                flops = float(a0.get("flops", 0.0))
        except Exception:
            pass
        print(f"compiling upto={upto} ({name})...", flush=True)
        np.asarray(jf(base, jnp.float32(0.0)))  # warmup/compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            # distinct submission each iter (dedupe guard) + scalar readback
            np.asarray(jf(base, jnp.float32(1e-6 * (i + 1))))
        dt = (time.perf_counter() - t0) / args.iters * 1000  # ms/prefix
        stage_ms = dt - prev_ms
        stage_gflop = ((flops - prev_flops) / 1e9) if flops else float("nan")
        prev_ms, prev_flops = dt, (flops if flops else prev_flops)
        comp_bound_ms = stage_gflop / (PEAK_FLOPS / 1e9) * 1000
        achieved = stage_gflop / max(stage_ms, 1e-9)  # GFLOP/ms == TFLOP/s
        results.append({
            "stage": name, "upto": upto, "prefix_ms": round(dt, 2),
            "stage_ms": round(stage_ms, 2),
            "stage_gflop": round(stage_gflop, 1),
            "achieved_tflops": round(achieved, 1),
            "compute_bound_ms": round(comp_bound_ms, 2),
            "pct_of_peak": round(achieved / (PEAK_FLOPS / 1e12) * 100, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    out = Path(args.json_out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"batch": b, "imgsz": s, "stages": results},
                              indent=2))
    print("\n| stage | ms | GFLOP | TFLOP/s | % bf16 peak | compute-bound ms |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['stage']} | {r['stage_ms']} | {r['stage_gflop']} | "
              f"{r['achieved_tflops']} | {r['pct_of_peak']} | "
              f"{r['compute_bound_ms']} |")


if __name__ == "__main__":
    main()
