"""Backward-inclusive roofline for the flagship TRAIN step (VERDICT r3 #1).

scripts/roofline.py times forward prefixes only; this differences jitted
`value_and_grad` programs over the same stage prefixes, so each stage's
forward+backward cost lands in one row, then times the three whole-step
programs (loss forward / loss grad / full step with optimizer+EMA) to expose
the TAL-loss and optimizer/EMA sinks that prefix truncation cannot see.

Honest-timing rules for the axon transport (docs/BENCHMARKS.md): distinct
submissions per iteration (on-device eps nudge) + per-iteration scalar
readback; stage times come from prefix differences so dispatch overhead
cancels.

Usage:  python scripts/roofline_train.py [--batch 48] [--iters 6] [--imgsz 640]
Writes: runs/roofline_train.json + markdown tables on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_FLOPS = 197e12  # v5e bf16 peak
PEAK_BW = 819e9

# coarser stage boundaries than roofline.py: each prefix needs its own
# differentiated compile over the tunnel (~1-5 min each)
STAGES = [
    (0, "enhance (lowlight_recovery)"),
    (5, "backbone P1-P3"),
    (10, "backbone P4-P5 + SPPF"),
    (22, "FPN (top-down + bottom-up)"),
    (25, "ASFF fusion x3"),
    (26, "Detect head (raw maps)"),
]


def time_jitted(jf, args_list, iters):
    """Compile, warm up, then time with per-iteration readbacks; each call
    gets a distinct eps so the transport cannot dedupe submissions."""
    flops = None
    try:
        an = jf.lower(*args_list(0)).compile().cost_analysis()
        if an:
            a0 = an[0] if isinstance(an, (list, tuple)) else an
            flops = float(a0.get("flops", 0.0))
    except Exception:
        pass
    t_c = time.perf_counter()
    np.asarray(jf(*args_list(0)))
    compile_s = time.perf_counter() - t_c
    np.asarray(jf(*args_list(1)))  # warmup
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(jf(*args_list(2 + i)))
    ms = (time.perf_counter() - t0) / iters * 1000
    return ms, flops, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-upto", type=int, default=-1,
                    help="remat layers <= this index in bwd (segmented "
                         "checkpointing; 5 covers the P1-P3 stem)")
    ap.add_argument("--max-boxes", type=int, default=32,
                    help="static GT padding (the production auto default "
                         "resolves from the dataset; 128 was the old fixed "
                         "ceiling)")
    ap.add_argument("--whole-only", action="store_true",
                    help="skip the per-stage prefixes; time only the three "
                         "whole-step programs (fast A/B, e.g. --remat)")
    ap.add_argument("--stages", default="",
                    help="comma-separated layer indices to use as prefix "
                         "boundaries instead of the default coarse stages "
                         "(e.g. '0,1,2,3,4,5' to split the backbone stem)")
    ap.add_argument("--stages-only", action="store_true",
                    help="skip the whole-step programs (fast stage probes)")
    ap.add_argument("--no-s2d", action="store_true",
                    help="disable the space-to-depth stem (shipping train "
                         "default is ON, runs/stem_ab.json)")
    ap.add_argument("--no-fpn-fuse", action="store_true",
                    help="disable the FPN top-down fuse (shipping train "
                         "default is ON, runs/fpn_ab.json)")
    ap.add_argument("--treewise-opt", action="store_true",
                    help="full step with the legacy per-leaf optimizer/EMA "
                         "instead of the fused flat-buffer production path")
    ap.add_argument("--json-out", default="runs/roofline_train.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.engine.optim import (flat_spec, flatten_for_opt,
                                              fused_ema_update,
                                              fused_init_opt_state,
                                              fused_opt_update_flat,
                                              init_opt_state, label_params,
                                              make_unflatten_diff,
                                              opt_update, tree_to_flat)
    from dedark_yolo_tpu.losses import detection_loss
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.ops.degrade import lowlight_degrade
    from dedark_yolo_tpu.utils import ema_init, ema_update

    b, s = args.batch, args.imgsz
    max_boxes = args.max_boxes
    d = model_yaml_load("yolov8l.yaml")
    d["nc"] = 3
    model = DetectionModel(d, remat_upto=args.remat_upto,
                           stem_s2d=not args.no_s2d,
                           fpn_fuse=not args.no_fpn_fuse)
    print("init params...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), imgsz=s)
    params, batch_stats = variables["params"], variables["batch_stats"]
    labels = label_params(params)
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 2.0}

    rng = np.random.default_rng(0)
    img_u8 = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)))
    bboxes = jax.device_put(jnp.asarray(
        rng.uniform(0.2, 0.7, (b, max_boxes, 4)).astype(np.float32)))
    cls = jax.device_put(jnp.asarray(
        rng.integers(0, 3, (b, max_boxes)).astype(np.float32)))
    mask_gt = jax.device_put(jnp.ones((b, max_boxes), jnp.float32))
    jax.block_until_ready((img_u8, bboxes, cls, mask_gt))

    def to_bf16(p):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    # ---- per-stage fwd+bwd: grad of sum(prefix output) wrt params ----------
    rows = []
    prev_ms, prev_flops = 0.0, 0.0
    stage_list = ([(int(s), f"layer {s}") for s in args.stages.split(",")]
                  if args.stages else STAGES)
    for upto, name in ([] if args.whole_only else stage_list):
        def prefix_loss(p, eps, _upto=upto):
            clean = img_u8.astype(jnp.float32) / 255.0 + eps
            img = lowlight_degrade(clean, 5.0)
            v = {"params": to_bf16(p), "batch_stats": batch_stats}
            y, _ = model.module.apply(v, img.astype(jnp.bfloat16),
                                      train=True, upto=_upto,
                                      mutable=["batch_stats"])
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(y))

        def gstep(p, eps, _fn=prefix_loss):
            val, g = jax.value_and_grad(_fn)(p, eps)
            # consume every grad leaf (sum-reduce on device, scalar back):
            # touching only one leaf lets XLA DCE the other layers' dW convs
            return val + sum(jnp.sum(t.astype(jnp.float32))
                             for t in jax.tree_util.tree_leaves(g))

        print(f"compiling grad prefix upto={upto} ({name})...", flush=True)
        jf = jax.jit(gstep)
        ms, flops, compile_s = time_jitted(
            jf, lambda i: (params, jnp.float32(1e-6 * i)), args.iters)
        stage_ms = ms - prev_ms
        stage_gflop = ((flops - prev_flops) / 1e9) if flops else float("nan")
        prev_ms, prev_flops = ms, (flops if flops else prev_flops)
        achieved = stage_gflop / max(stage_ms, 1e-9)
        rows.append({
            "stage": name, "upto": upto, "prefix_ms": round(ms, 2),
            "stage_ms": round(stage_ms, 2),
            "stage_gflop": round(stage_gflop, 1),
            "achieved_tflops": round(achieved, 1),
            "pct_of_peak": round(achieved / (PEAK_FLOPS / 1e12) * 100, 1),
            "compile_s": round(compile_s, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    # ---- whole-step decomposition ------------------------------------------
    def loss_fn(p, eps):
        clean = img_u8.astype(jnp.float32) / 255.0 + eps
        img = lowlight_degrade(clean, 5.0)
        v = {"params": to_bf16(p), "batch_stats": batch_stats}
        raw, new_stats = model.apply_train(v, img.astype(jnp.bfloat16),
                                           None, None)
        raw = jax.tree_util.tree_map(lambda r: r.astype(jnp.float32), raw)
        lbatch = {"cls": cls, "bboxes": bboxes, "mask_gt": mask_gt,
                  "recovery_loss": jnp.mean((img - clean) ** 2)}
        total, items = detection_loss(raw, lbatch, nc=model.nc,
                                      strides=model.strides, hyp=hyp)
        return total, new_stats

    base_loss = loss_fn
    if args.remat:
        base_loss = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.nothing_saveable)

    whole = {}

    print("compiling loss forward...", flush=True)
    jf_fwd = jax.jit(lambda p, eps: base_loss(p, eps)[0])
    ms, flops, cs = time_jitted(
        jf_fwd, lambda i: (params, jnp.float32(1e-6 * i)), args.iters)
    whole["loss_fwd"] = {"ms": round(ms, 2),
                         "gflop": round((flops or 0) / 1e9, 1),
                         "compile_s": round(cs, 1)}
    print(json.dumps({"loss_fwd": whole["loss_fwd"]}), flush=True)

    print("compiling loss grad...", flush=True)

    def grad_only(p, eps):
        (total, _), g = jax.value_and_grad(base_loss, has_aux=True)(p, eps)
        # consume EVERY grad leaf: reading back only one lets XLA dead-code
        # -eliminate the other layers' dW convs (~1/3 of bwd FLOPs), which
        # then get misattributed to the opt+EMA delta in `derived`
        return total + sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree_util.tree_leaves(g))

    jf_grad = jax.jit(grad_only)
    ms, flops, cs = time_jitted(
        jf_grad, lambda i: (params, jnp.float32(1e-6 * i)), args.iters)
    whole["loss_grad"] = {"ms": round(ms, 2),
                          "gflop": round((flops or 0) / 1e9, 1),
                          "compile_s": round(cs, 1)}
    print(json.dumps({"loss_grad": whole["loss_grad"]}), flush=True)

    print("compiling full train step (grad+opt+EMA, donated)...", flush=True)

    spec = flatten_for_opt(params, labels)
    bspec = flat_spec(batch_stats)
    unflat = make_unflatten_diff(spec)

    def full_step(p, bs, opt, ema, eu, eps):
        def lf(p_tree):
            clean = img_u8.astype(jnp.float32) / 255.0 + eps
            img = lowlight_degrade(clean, 5.0)
            v = {"params": to_bf16(p_tree), "batch_stats": bs}
            raw, new_stats = model.apply_train(v, img.astype(jnp.bfloat16),
                                               None, None)
            raw = jax.tree_util.tree_map(lambda r: r.astype(jnp.float32), raw)
            lbatch = {"cls": cls, "bboxes": bboxes, "mask_gt": mask_gt,
                      "recovery_loss": jnp.mean((img - clean) ** 2)}
            total, items = detection_loss(raw, lbatch, nc=model.nc,
                                          strides=model.strides, hyp=hyp)
            return total, new_stats
        if args.treewise_opt:
            if args.remat:
                lf = jax.checkpoint(
                    lf, policy=jax.checkpoint_policies.nothing_saveable)
            (total, new_stats), g = jax.value_and_grad(lf, has_aux=True)(p)
            p, opt, _ = opt_update(p, g, opt, labels, kind="sgd",
                                   lr_bias=jnp.float32(0.01),
                                   lr=jnp.float32(0.01),
                                   momentum=jnp.float32(0.937), accumulate=1)
            ema, eu = ema_update(ema, {"params": p,
                                       "batch_stats": new_stats}, eu)
        else:
            # production path (engine/trainer.py train_step flat-master):
            # p IS the flat fp32 master vector; differentiate through the
            # custom-VJP unflatten (bwd = one concatenate), then pure flat
            # optimizer + EMA — no tree<->flat boundaries in the step
            lff = lambda pf: lf(unflat(pf))
            if args.remat:
                lff = jax.checkpoint(
                    lff, policy=jax.checkpoint_policies.nothing_saveable)
            (total, new_stats), g = jax.value_and_grad(lff, has_aux=True)(p)
            p, opt, applied = fused_opt_update_flat(
                p, g, opt, kind="sgd", lr_bias=jnp.float32(0.01),
                lr=jnp.float32(0.01), momentum=jnp.float32(0.937),
                accumulate=1)
            ema_p, ema_b, eu = fused_ema_update(
                ema["params"], ema["batch_stats"], p,
                tree_to_flat(new_stats, bspec), eu, applied)
            ema = {"params": ema_p, "batch_stats": ema_b}
        return p, new_stats, opt, ema, eu, total

    jf_full = jax.jit(full_step, donate_argnums=(0, 1, 2, 3))

    if args.treewise_opt:
        opt0 = init_opt_state(params)
        ema0 = ema_init({"params": params, "batch_stats": batch_stats})
        p0 = params
    else:
        opt0 = fused_init_opt_state(params, spec)
        ema0 = {"params": tree_to_flat(params, spec),
                "batch_stats": tree_to_flat(batch_stats, bspec)}
        p0 = tree_to_flat(params, spec)
    state = {"p": p0, "bs": batch_stats, "opt": opt0, "ema": ema0,
             "eu": jnp.zeros((), jnp.int32)}

    def call_full(i):
        return (state["p"], state["bs"], state["opt"], state["ema"],
                state["eu"], jnp.float32(1e-6 * i))

    # donation consumes state: run manually
    flops = None
    try:
        an = jf_full.lower(*call_full(0)).compile().cost_analysis()
        if an:
            a0 = an[0] if isinstance(an, (list, tuple)) else an
            flops = float(a0.get("flops", 0.0))
    except Exception:
        pass
    t_c = time.perf_counter()
    out = jf_full(*call_full(0))
    state = dict(zip(("p", "bs", "opt", "ema", "eu"), out[:5]))
    float(out[5])
    cs = time.perf_counter() - t_c
    out = jf_full(*call_full(1))
    state = dict(zip(("p", "bs", "opt", "ema", "eu"), out[:5]))
    float(out[5])
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = jf_full(*call_full(2 + i))
        state = dict(zip(("p", "bs", "opt", "ema", "eu"), out[:5]))
        float(out[5])  # per-iteration readback
    ms = (time.perf_counter() - t0) / args.iters * 1000
    whole["full_step"] = {"ms": round(ms, 2),
                          "gflop": round((flops or 0) / 1e9, 1),
                          "compile_s": round(cs, 1),
                          "img_per_s": round(b / (ms / 1000), 1)}
    print(json.dumps({"full_step": whole["full_step"]}), flush=True)

    # derived sinks
    head_ms = rows[-1]["prefix_ms"] if rows else float("nan")
    derived = {
        "tal_loss_ms": round(whole["loss_grad"]["ms"] - head_ms, 2),
        "opt_ema_ms": round(whole["full_step"]["ms"]
                            - whole["loss_grad"]["ms"], 2),
        "bwd_over_fwd": round(whole["loss_grad"]["ms"]
                              / max(whole["loss_fwd"]["ms"], 1e-9), 2),
        "achieved_tflops_full": round(
            whole["full_step"]["gflop"] / whole["full_step"]["ms"], 1),
        "pct_peak_full": round(
            whole["full_step"]["gflop"] / whole["full_step"]["ms"]
            / (PEAK_FLOPS / 1e12) * 100, 1),
    }
    print(json.dumps(derived), flush=True)

    out_p = Path(args.json_out)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    out_p.write_text(json.dumps(
        {"batch": b, "imgsz": s, "remat": args.remat, "stages": rows,
         "whole": whole, "derived": derived}, indent=2))

    print("\n| stage (fwd+bwd) | ms | GFLOP | TFLOP/s | % bf16 peak |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['stage']} | {r['stage_ms']} | {r['stage_gflop']} | "
              f"{r['achieved_tflops']} | {r['pct_of_peak']} |")
    print(f"\nloss fwd {whole['loss_fwd']['ms']} ms | loss grad "
          f"{whole['loss_grad']['ms']} ms | full step "
          f"{whole['full_step']['ms']} ms "
          f"({whole['full_step']['img_per_s']} img/s) | TAL+loss "
          f"{derived['tal_loss_ms']} ms | opt+EMA {derived['opt_ema_ms']} ms")


if __name__ == "__main__":
    main()
