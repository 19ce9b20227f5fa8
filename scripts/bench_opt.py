"""Isolate the optimizer+EMA device cost on flagship-shaped params.

VERDICT r3 next #1 flagged the train-step MFU; runs/roofline_train.json
attributed ~123 ms/step to "opt+EMA", but that delta also absorbed the
dW convs DCE'd out of the grad-only program. This benchmark times the
optimizer+EMA *alone* — same param tree as the yolov8l flagship, dummy
grads — so the real sink is sized directly, and A/Bs candidate
implementations:

  treewise   current engine/optim.py opt_update + utils/ema.py ema_update
  nocond     same math, accumulate=1 fast path without the lax.cond
  fused      single flat fp32 buffer per state tensor, per-element lr/wd
             masks precomputed (one big elementwise kernel instead of
             ~500 leaf-sized ones)

Usage: python scripts/bench_opt.py [--iters 20] [--kind sgd]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def time_donated(jf, make_state, extra_args, iters):
    # per-iteration scalar readback: block_until_ready is a no-op on the
    # axon transport (docs/BENCHMARKS.md honest-timing rules), and the
    # ema_updates counter is the cheapest always-materialized output
    state = make_state()
    t0 = time.perf_counter()
    state = jf(*state, *extra_args(0))
    np.asarray(state[-1])
    compile_s = time.perf_counter() - t0
    state = jf(*state, *extra_args(1))
    np.asarray(state[-1])
    t0 = time.perf_counter()
    for i in range(iters):
        state = jf(*state, *extra_args(2 + i))
        np.asarray(state[-1])
    ms = (time.perf_counter() - t0) / iters * 1000
    return ms, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--kind", default="sgd")
    ap.add_argument("--json-out", default="runs/bench_opt.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.engine.optim import (init_opt_state, label_params,
                                              opt_update)
    from dedark_yolo_tpu.utils import ema_init, ema_update

    d = model_yaml_load("yolov8l.yaml")
    d["nc"] = 3
    from dedark_yolo_tpu.nn.graph import DetectionModel
    model = DetectionModel(d)
    variables = model.init(jax.random.PRNGKey(0), imgsz=640)
    params, batch_stats = variables["params"], variables["batch_stats"]
    labels = label_params(params)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{n_leaves} leaves, {n_params/1e6:.1f}M params", flush=True)

    rng = np.random.default_rng(0)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(0, 1e-3, p.shape).astype(np.float32)),
        params)
    results = {}

    # ---- treewise (current production path) --------------------------------
    def step_tree(p, opt, ema, eu, g, lr):
        p, opt, applied = opt_update(p, g, opt, labels, kind=args.kind,
                                     lr_bias=lr, lr=lr,
                                     momentum=jnp.float32(0.937), accumulate=1)
        cur = {"params": p, "batch_stats": batch_stats}
        ema, eu = jax.lax.cond(
            applied, lambda t: ema_update(t[0], cur, t[1]), lambda t: t,
            (ema, eu))
        return p, opt, ema, eu

    # each make_state() copies params: the jitted steps DONATE them, so
    # reusing the original buffers in the next variant would hit deleted arrays
    fresh = lambda: jax.tree_util.tree_map(
        lambda p: jnp.array(p, copy=True), params)

    jf = jax.jit(step_tree, donate_argnums=(0, 1, 2, 3))
    make_state = lambda: (fresh(), init_opt_state(params),
                          ema_init({"params": params,
                                    "batch_stats": batch_stats}),
                          jnp.zeros((), jnp.int32))
    extra = lambda i: (grads, jnp.float32(0.01 + 1e-6 * i))
    ms, cs = time_donated(jf, make_state, extra, args.iters)
    results["treewise"] = {"ms": round(ms, 2), "compile_s": round(cs, 1)}
    print(json.dumps({"treewise": results["treewise"]}), flush=True)

    # ---- fused flat ---------------------------------------------------------
    from dedark_yolo_tpu.engine.optim import (flatten_for_opt,
                                              fused_opt_available)
    if fused_opt_available():
        from dedark_yolo_tpu.engine.optim import (flat_spec,
                                                  fused_ema_update,
                                                  fused_init_opt_state,
                                                  fused_opt_update,
                                                  tree_to_flat)
        spec = flatten_for_opt(params, labels)
        bspec = flat_spec(batch_stats)

        def step_fused(p, opt, ema, eu, g, lr):
            # the production fused path (engine/trainer.py train_step):
            # flat opt update + flat EMA over params AND batch_stats
            p, opt, applied, p_flat = fused_opt_update(
                p, g, opt, spec, kind=args.kind, lr_bias=lr, lr=lr,
                momentum=jnp.float32(0.937), accumulate=1, return_flat=True)
            ema_p, ema_b, eu = fused_ema_update(
                ema["params"], ema["batch_stats"], p_flat,
                tree_to_flat(batch_stats, bspec), eu, applied)
            return p, opt, {"params": ema_p, "batch_stats": ema_b}, eu

        jf = jax.jit(step_fused, donate_argnums=(0, 1, 2, 3))
        make_state = lambda: (fresh(), fused_init_opt_state(params, spec),
                              {"params": tree_to_flat(params, spec),
                               "batch_stats": tree_to_flat(batch_stats,
                                                           bspec)},
                              jnp.zeros((), jnp.int32))
        ms, cs = time_donated(jf, make_state, extra, args.iters)
        results["fused"] = {"ms": round(ms, 2), "compile_s": round(cs, 1)}
        print(json.dumps({"fused": results["fused"]}), flush=True)

        # ---- flat-master (no tree<->flat boundaries at all) -----------------
        from dedark_yolo_tpu.engine.optim import fused_opt_update_flat
        g_flat_const = tree_to_flat(grads, spec)
        bs_flat_const = tree_to_flat(batch_stats, bspec)

        def step_flat(pf, opt, ema, eu, g, lr):
            pf, opt, applied = fused_opt_update_flat(
                pf, g, opt, kind=args.kind, lr_bias=lr, lr=lr,
                momentum=jnp.float32(0.937), accumulate=1)
            ema_p, ema_b, eu = fused_ema_update(
                ema["params"], ema["batch_stats"], pf, bs_flat_const,
                eu, applied)
            return pf, opt, {"params": ema_p, "batch_stats": ema_b}, eu

        jf = jax.jit(step_flat, donate_argnums=(0, 1, 2, 3))
        make_state = lambda: (tree_to_flat(params, spec),
                              fused_init_opt_state(params, spec),
                              {"params": tree_to_flat(params, spec),
                               "batch_stats": tree_to_flat(batch_stats,
                                                           bspec)},
                              jnp.zeros((), jnp.int32))
        extra_flat = lambda i: (g_flat_const, jnp.float32(0.01 + 1e-6 * i))
        ms, cs = time_donated(jf, make_state, extra_flat, args.iters)
        results["flatmaster"] = {"ms": round(ms, 2), "compile_s": round(cs, 1)}
        print(json.dumps({"flatmaster": results["flatmaster"]}), flush=True)

    out = Path(args.json_out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"kind": args.kind, "n_leaves": n_leaves,
         "n_params_m": round(n_params / 1e6, 1), **results}, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
