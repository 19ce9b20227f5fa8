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
    from dedark_yolo_tpu.engine.optim import (init_opt_state, opt_update,
                                              label_params)
    from dedark_yolo_tpu.ops.degrade import lowlight_degrade
    from dedark_yolo_tpu.ops.dark_channel import dark_channel_priors
    from dedark_yolo_tpu.utils import ema_init, ema_update

    s = args.imgsz
    max_boxes = 32
    d = model_yaml_load("yolov8l.yaml")
    d["nc"] = 3
    model = DetectionModel(d, remat_upto=args.remat_upto)
    variables = model.init(jax.random.PRNGKey(0), imgsz=s)
    params, batch_stats = variables["params"], variables["batch_stats"]
    labels = label_params(params)
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

    if args.remat:
        loss_fn = jax.checkpoint(loss_fn,
                                 policy=jax.checkpoint_policies.nothing_saveable)

    def train_step(params, batch_stats, opt_state, ema, ema_updates, batch):
        (total, (items, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        params, opt_state, _ = opt_update(
            params, grads, opt_state, labels, kind="sgd",
            lr_bias=jnp.float32(0.01), lr=jnp.float32(0.01),
            momentum=jnp.float32(0.937), accumulate=1)
        ema, ema_updates = ema_update(ema, {"params": params,
                                            "batch_stats": new_stats},
                                      ema_updates)
        return params, new_stats, opt_state, ema, ema_updates, total

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
        p, bs = params, batch_stats
        opt = init_opt_state(p)
        ema = ema_init({"params": p, "batch_stats": bs})
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
