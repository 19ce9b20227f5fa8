"""RT-DETR decoder stack tests.

The reference's RT-DETR path cannot execute (head.py:325 imports the missing
`ultralytics.models.utils`), so the numeric anchor here is torch's own
grid_sample for the deformable-attention sampler plus shape/range invariants
for the full head (reference head.py:263-457, transformer.py:187-378).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_bilinear_sampler_matches_torch_grid_sample():
    """_sample_level == F.grid_sample(bilinear, zeros, align_corners=False)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from dedark_yolo_tpu.nn.transformer import _sample_level

    rng = np.random.default_rng(0)
    b, h, w, nh, hd, lq, npts = 2, 7, 5, 3, 4, 6, 4
    value = rng.normal(size=(b, h * w, nh, hd)).astype(np.float32)
    # locations straddle the border so the zeros padding path is exercised
    loc = rng.uniform(-0.2, 1.2, size=(b, lq, nh, npts, 2)).astype(np.float32)

    got = np.asarray(_sample_level(jnp.asarray(value), jnp.asarray(loc), h, w))

    # torch: (b*nh, hd, h, w) sampled at grid (b*nh, lq, npts, 2) in [-1, 1]
    v = torch.from_numpy(value).reshape(b, h, w, nh, hd)
    v = v.permute(0, 3, 4, 1, 2).reshape(b * nh, hd, h, w)
    g = torch.from_numpy(loc * 2 - 1).permute(0, 2, 1, 3, 4)
    g = g.reshape(b * nh, lq, npts, 2)
    want = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                         align_corners=False)          # (b*nh, hd, lq, npts)
    want = want.reshape(b, nh, hd, lq, npts).permute(0, 3, 1, 4, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _tiny_feats(rng, b=1):
    return [jnp.asarray(rng.normal(size=(b, 8, 8, 16)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(b, 4, 4, 32)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(b, 2, 2, 64)).astype(np.float32))]


def test_msdeform_attn_shapes_and_weights_sum():
    from dedark_yolo_tpu.nn.transformer import MSDeformAttn
    rng = np.random.default_rng(1)
    feats = [jnp.asarray(rng.normal(size=(2, s, s, 32)).astype(np.float32))
             for s in (8, 4, 2)]
    q = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    refer = jnp.asarray(rng.uniform(0.2, 0.8, size=(2, 5, 4)).astype(np.float32))
    m = MSDeformAttn(d_model=32, n_levels=3, n_heads=4, n_points=2)
    v = m.init(jax.random.PRNGKey(0), q, refer, feats)
    out = m.apply(v, q, refer, feats)
    assert out.shape == (2, 5, 32)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_rtdetr_head_output_contract():
    """(B, nq, 4+nc): boxes and scores both sigmoid-bounded in [0, 1]."""
    from dedark_yolo_tpu.nn.heads import RTDETRDecoder
    rng = np.random.default_rng(2)
    feats = _tiny_feats(rng)
    head = RTDETRDecoder(nc=5, hd=32, nq=16, nh=4, ndl=2, d_ffn=64,
                         strides=(8, 16, 32))
    v = head.init(jax.random.PRNGKey(0), feats)
    y = head.apply(v, feats)
    assert y.shape == (1, 16, 9)
    y = np.asarray(y)
    assert np.all(y >= 0) and np.all(y <= 1)
    assert np.all(np.isfinite(y))


@pytest.mark.slow
def test_rtdetr_model_end_to_end_decode():
    """Builder plumbs extended yaml args; apply_eval returns pixel boxes."""
    from dedark_yolo_tpu.nn.graph import DetectionModel
    d = {
        "nc": 4,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],   # 2  P3/8
            [-1, 1, "Conv", [32, 3, 2]],   # 3  P4/16
            [-1, 1, "Conv", [32, 3, 2]],   # 4  P5/32
        ],
        "head": [
            [[2, 3, 4], 1, "RTDETRDecoder", ["nc", 32, 16, 2]],
        ],
    }
    m = DetectionModel(d)
    assert m.head["name"] == "RTDETRDecoder"
    assert m.head["strides"] == (8, 16, 32)
    variables = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(3)
                    .uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    boxes, scores = m.apply_eval(variables, x)
    assert boxes.shape == (1, 16, 4)
    assert scores.shape == (1, 16, 4)
    b = np.asarray(boxes)
    assert np.all(b >= 0) and np.all(b <= 64)  # normalized cxcywh * imgsz
    # train-mode forward returns per-layer aux outputs for the matching loss
    raw, new_stats = m.apply_train(variables, x)
    assert raw["dec_bboxes"].shape == (2, 1, 16, 4)   # (ndl, B, nq, 4)
    assert raw["dec_logits"].shape == (2, 1, 16, 4)
    assert raw["enc_bboxes"].shape == (1, 16, 4)
    assert raw["enc_logits"].shape == (1, 16, 4)


def test_greedy_assign_one_to_one_and_near_optimal():
    from dedark_yolo_tpu.losses.rtdetr import greedy_assign
    scipy_opt = pytest.importorskip("scipy.optimize")
    rng = np.random.default_rng(0)
    cost = rng.uniform(0, 1, (3, 24, 6)).astype(np.float32)
    mask = np.ones((3, 6), np.float32)
    mask[1, 4:] = 0.0    # padded gts in one batch element
    aq, matched = greedy_assign(jnp.asarray(cost), jnp.asarray(mask))
    aq, matched = np.asarray(aq), np.asarray(matched)
    for b in range(3):
        m = int(mask[b].sum())
        assert matched[b, :m].tolist() == [1.0] * m   # every real gt matched
        real = aq[b, :m]
        assert len(set(real.tolist())) == m    # one-to-one over real gts
        greedy_cost = cost[b, real, np.arange(m)].sum()
        r, c = scipy_opt.linear_sum_assignment(cost[b, :, :m].T)
        opt = cost[b, c, r].sum()
        assert greedy_cost <= opt * 1.25 + 1e-6
    # diagonal-dominant instance: greedy IS optimal
    strong = np.full((1, 8, 4), 5.0, np.float32)
    for j in range(4):
        strong[0, j, j] = 0.1 * (j + 1)
    aq, _ = greedy_assign(jnp.asarray(strong), jnp.ones((1, 4), np.float32))
    assert np.asarray(aq)[0].tolist() == [0, 1, 2, 3]


def test_greedy_assign_more_gts_than_queries():
    """nq < real gts: excess gts get matched=0 and no query is reused."""
    from dedark_yolo_tpu.losses.rtdetr import greedy_assign
    rng = np.random.default_rng(7)
    cost = rng.uniform(0, 1, (1, 3, 6)).astype(np.float32)  # 3 queries, 6 gts
    mask = np.ones((1, 6), np.float32)
    aq, matched = greedy_assign(jnp.asarray(cost), jnp.asarray(mask))
    aq, matched = np.asarray(aq), np.asarray(matched)
    assert matched.sum() == 3.0                     # only nq gts can match
    used = aq[0][matched[0] > 0]
    assert len(set(used.tolist())) == 3             # no query reused


@pytest.mark.slow
def test_rtdetr_loss_grads_and_separation():
    """Loss is finite, has gradients, and perfect predictions score lower."""
    from dedark_yolo_tpu.losses.rtdetr import rtdetr_loss
    rng = np.random.default_rng(4)
    B, nq, nc, M, L = 2, 12, 3, 4, 2
    gt_boxes = rng.uniform(0.2, 0.6, (B, M, 4)).astype(np.float32)
    gt_cls = rng.integers(0, nc, (B, M)).astype(np.float32)
    mask = np.ones((B, M), np.float32)
    batch = {"cls": jnp.asarray(gt_cls), "bboxes": jnp.asarray(gt_boxes),
             "mask_gt": jnp.asarray(mask)}

    def outputs(boxes, logits):
        return {"dec_bboxes": jnp.asarray(np.tile(boxes, (L, 1, 1, 1))),
                "dec_logits": jnp.asarray(np.tile(logits, (L, 1, 1, 1))),
                "enc_bboxes": jnp.asarray(boxes),
                "enc_logits": jnp.asarray(logits)}

    rand_out = outputs(rng.uniform(0.1, 0.9, (B, nq, 4)).astype(np.float32),
                       rng.normal(0, 1, (B, nq, nc)).astype(np.float32))
    total_rand, items = rtdetr_loss(rand_out, batch, nc)
    assert np.isfinite(float(total_rand))
    assert all(np.isfinite(float(v)) for v in items)

    # perfect: first M queries carry gt boxes with +8 logit at the gt class
    pb = rng.uniform(0.1, 0.9, (B, nq, 4)).astype(np.float32)
    pl = np.full((B, nq, nc), -8.0, np.float32)
    for b in range(B):
        pb[b, :M] = gt_boxes[b]
        for j in range(M):
            pl[b, j, int(gt_cls[b, j])] = 8.0
    total_perfect, _ = rtdetr_loss(outputs(pb, pl), batch, nc)
    assert float(total_perfect) < 0.2 * float(total_rand)

    g = jax.grad(lambda o: rtdetr_loss(o, batch, nc)[0])(rand_out)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_rtdetr_facade_predict_and_val(tmp_path):
    """YOLO facade drives an RT-DETR model end to end (predict + val)."""
    from synth import make_synth_dataset
    from dedark_yolo_tpu import YOLO
    yp = make_synth_dataset(tmp_path / "ds", n_train=2, n_val=2, imgsz=96)
    m = YOLO("tests/tiny_rtdetr.yaml")
    img = np.random.default_rng(6).integers(
        0, 255, (96, 96, 3)).astype(np.uint8)
    results = m.predict(img, imgsz=96, conf=0.05, max_nms=64, max_det=10,
                        save=False, verbose=False)
    assert len(results) == 1 and results[0].boxes is not None
    metrics = m.val(data=str(yp), imgsz=96, batch=2, max_nms=64, max_det=10,
                    plots=False, save_json=False, project=str(tmp_path),
                    name="val")
    assert "metrics/mAP50(B)" in metrics


@pytest.mark.slow
def test_rtdetr_val_loss_items_are_real(tmp_path):
    """Training-val must report the actual matching loss for RT-DETR, not
    fabricated zeros (ADVICE r2 #3): the validator runs a train-mode forward
    for the per-layer aux outputs and computes rtdetr_loss."""
    from synth import make_synth_dataset
    from dedark_yolo_tpu.cfg import get_cfg, DEFAULT_CFG_DICT, model_yaml_load
    from dedark_yolo_tpu.engine.validator import DetectionValidator
    from dedark_yolo_tpu.nn.graph import DetectionModel
    yp = make_synth_dataset(tmp_path / "ds", n_train=2, n_val=2, imgsz=96)
    m = DetectionModel(model_yaml_load("tests/tiny_rtdetr.yaml"))
    v = m.init(jax.random.PRNGKey(0), imgsz=96)
    args = get_cfg(DEFAULT_CFG_DICT,
                   dict(data=str(yp), imgsz=96, batch=2, max_nms=64,
                        max_det=10, plots=False, project=str(tmp_path),
                        name="val"))
    res = DetectionValidator(args=args)(model=m, params=v["params"],
                                        batch_stats=v["batch_stats"],
                                        with_loss=True)
    losses = [res[k] for k in res if k.startswith("val/")]
    assert losses, res.keys()
    assert all(np.isfinite(x) for x in losses), res
    assert any(abs(float(x)) > 1e-6 for x in losses), (
        "RT-DETR val losses are all zero — fabricated items?", res)


@pytest.mark.slow
def test_rtdetr_tiny_model_learns():
    """Full model + matching loss: loss decreases under adam on one batch."""
    import optax
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.losses.rtdetr import rtdetr_loss
    d = {"nc": 2,
         "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [8, 3, 2]],
                      [-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]],
                      [-1, 1, "Conv", [16, 3, 2]]],
         "head": [[[2, 3, 4], 1, "RTDETRDecoder", ["nc", 32, 8, 2]]]}
    m = DetectionModel(d)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    batch = {"cls": jnp.asarray(rng.integers(0, 2, (2, 3)).astype(np.float32)),
             "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (2, 3, 4))
                                   .astype(np.float32)),
             "mask_gt": jnp.ones((2, 3), jnp.float32)}

    def loss_fn(params, bs):
        out, new_bs = m.apply_train({"params": params, "batch_stats": bs}, img)
        total, _ = rtdetr_loss(out, batch, m.nc)
        return total, new_bs

    opt = optax.adam(1e-3)
    params, bs = v["params"], v["batch_stats"]
    state = opt.init(params)

    @jax.jit
    def step(params, bs, state):
        (total, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bs)
        upd, state = opt.update(grads, state, params)
        return optax.apply_updates(params, upd), new_bs, state, total

    first = None
    for i in range(30):
        params, bs, state, total = step(params, bs, state)
        if first is None:
            first = float(total)
    assert float(total) < 0.7 * first, (first, float(total))
