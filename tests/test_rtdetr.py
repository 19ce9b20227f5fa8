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
    # train-mode forward also runs (BN stats mutate; no denoising branch)
    raw, new_stats = m.apply_train(variables, x)
    assert raw.shape == (1, 16, 8)
