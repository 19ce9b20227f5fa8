"""Training-step throughput sweep on the flagship graph (single chip).

Measures the FULL dedark train step (uint8 batch -> degrade -> dark-channel
priors -> enhance -> forward -> TAL loss -> grads -> SGD(nesterov) -> EMA) at
increasing batch sizes, honest-timing pattern (distinct input buffers,
per-iteration host readback). --remat wraps the loss in jax.checkpoint
(full rematerialization: recompute the forward during backward instead of
storing activations) to trade ~1/3 more FLOPs for activation memory — the
lever that unlocks larger train batches at 640px.

Usage: python scripts/train_bench.py [--batches 8,16,32] [--imgsz 640]
       [--fp32] [--remat]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-upto", type=int, default=-1,
                    help="selective remat: recompute layers <= this index in "
                         "the backward (0 = just lowlight_recovery, whose "
                         "saved full-res residuals are the cheapest HBM to "
                         "reclaim; 5 = the P1-P3 stem too)")
    ap.add_argument("--priors", choices=("default", "computed"),
                    default="default",
                    help="dedark prior mode: 'default' = A=0.8/IcA=0.5 "
                         "(trainer default, matches the reference's effective "
                         "behavior); 'computed' adds in-graph dark-channel "
                         "priors")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
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
    from dedark_yolo_tpu.ops.dark_channel import dark_channel_priors

    s = args.imgsz
    max_boxes = 32
    d = model_yaml_load("yolov8l.yaml")
    d["nc"] = 3
    model = DetectionModel(d, remat_upto=args.remat_upto)
    variables = model.init(jax.random.PRNGKey(0), imgsz=s)
    params, batch_stats = variables["params"], variables["batch_stats"]
    labels = label_params(params)
    # production optimizer path (engine/trainer.py): flat-master params +
    # fused flat opt/EMA — this script must measure what the trainer runs
    spec = flatten_for_opt(params, labels)
    bspec = flat_spec(batch_stats)
    unflat = make_unflatten_diff(spec)
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "lrl": 2.0}
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    use_computed = args.priors == "computed"

    def loss_fn(params, batch_stats, batch):
        if dtype == jnp.bfloat16:
            # trainer amp semantics: master params stay f32 in the optimizer,
            # the forward runs bf16 (engine/trainer.py make_loss_fn)
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
        clean = batch["img"].astype(jnp.float32) / 255.0
        img = lowlight_degrade(clean, 5.0)
        dedark_A = IcA = None
        if use_computed:
            dedark_A, IcA = dark_channel_priors(img)
            dedark_A, IcA = dedark_A.astype(dtype), IcA.astype(dtype)
        v = {"params": params, "batch_stats": batch_stats}
        raw, new_stats = model.apply_train(v, img.astype(dtype),
                                           dedark_A, IcA)
        if dtype == jnp.bfloat16:
            raw = jax.tree_util.tree_map(
                lambda r: r.astype(jnp.float32), raw)   # loss math in f32
        lbatch = {"cls": batch["cls"], "bboxes": batch["bboxes"],
                  "mask_gt": batch["mask_gt"],
                  "recovery_loss": jnp.mean((img - clean) ** 2)}
        total, items = detection_loss(raw, lbatch, nc=model.nc,
                                      strides=model.strides, hyp=hyp)
        return total, (items, new_stats)

    def train_step(p_flat, batch_stats, opt_state, ema, ema_updates, batch):
        lff = lambda pf, bs, b: loss_fn(unflat(pf), bs, b)
        if args.remat:
            lff = jax.checkpoint(
                lff, policy=jax.checkpoint_policies.nothing_saveable)
        (total, (items, new_stats)), g_flat = jax.value_and_grad(
            lff, has_aux=True)(p_flat, batch_stats, batch)
        p_flat, opt_state, applied = fused_opt_update_flat(
            p_flat, g_flat, opt_state, kind="sgd",
            lr_bias=jnp.float32(0.01), lr=jnp.float32(0.01),
            momentum=jnp.float32(0.937), accumulate=1)
        ema_p, ema_b, ema_updates = fused_ema_update(
            ema["params"], ema["batch_stats"], p_flat,
            tree_to_flat(new_stats, bspec), ema_updates, applied)
        ema = {"params": ema_p, "batch_stats": ema_b}
        return p_flat, new_stats, opt_state, ema, ema_updates, total

    step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))

    rng = np.random.default_rng(0)
    for b in [int(x) for x in args.batches.split(",")]:
        batches = []
        for _ in range(2):  # distinct DEVICE-staged buffers, round-robin
            batches.append({
                "img": rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8),
                "bboxes": rng.uniform(0.2, 0.7, (b, max_boxes, 4)).astype(np.float32),
                "cls": rng.integers(0, 3, (b, max_boxes)).astype(np.float32),
                "mask_gt": np.ones((b, max_boxes), np.float32),
            })
        # pre-stage on device: over a remote transport the per-step host->
        # device batch upload costs 100s of ms and would swamp the step time
        # (the real trainer overlaps uploads via its prefetching loader)
        batches = jax.device_put(batches)
        jax.block_until_ready(batches)
        p, bs = tree_to_flat(params, spec), batch_stats
        opt = fused_init_opt_state(params, spec)
        ema = {"params": tree_to_flat(params, spec),
               "batch_stats": tree_to_flat(batch_stats, bspec)}
        eu = jnp.zeros((), jnp.int32)
        try:
            t_c = time.perf_counter()
            p, bs, opt, ema, eu, total = step(p, bs, opt, ema, eu, batches[0])
            _ = float(total)
            compile_s = time.perf_counter() - t_c
            for i in range(2):  # warmup post-compile
                p, bs, opt, ema, eu, total = step(p, bs, opt, ema, eu,
                                                  batches[i % 2])
                _ = float(total)
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, bs, opt, ema, eu, total = step(p, bs, opt, ema, eu,
                                                  batches[i % 2])
                _ = float(total)  # per-iteration readback
            dt = (time.perf_counter() - t0) / args.iters
            print(f"b{b}: {dt * 1e3:.1f} ms/step  {b / dt:.1f} img/s  "
                  f"(compile {compile_s:.0f}s, remat={args.remat}, "
                  f"remat_upto={args.remat_upto}, "
                  f"{'fp32' if args.fp32 else 'bf16'})")
        except Exception as e:
            print(f"b{b}: FAILED ({type(e).__name__}: {str(e)[:200]})")
        # fresh params for the next size (donated buffers were consumed)
        variables = model.init(jax.random.PRNGKey(0), imgsz=s)
        params, batch_stats = variables["params"], variables["batch_stats"]


if __name__ == "__main__":
    main()
