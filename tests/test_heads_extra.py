"""Segment/Pose head module tests (shape + decode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dedark_yolo_tpu.nn.heads import Segment, Pose, decode_keypoints


def _feats(b=1):
    rng = jax.random.PRNGKey(0)
    shapes = [(16, 16, 64), (8, 8, 128), (4, 4, 128)]
    return [jax.random.normal(jax.random.PRNGKey(i), (b, *s)) * 0.1
            for i, s in enumerate(shapes)]


@pytest.mark.slow
def test_segment_head_shapes():
    xs = _feats()
    head = Segment(nc=3, nm=32, npr=64)
    variables = head.init(jax.random.PRNGKey(0), xs)
    det, coefs, protos = head.apply(variables, xs)
    assert len(det) == 3 and det[0].shape == (1, 16, 16, 64 + 3)
    assert [c.shape[-1] for c in coefs] == [32, 32, 32]
    assert protos.shape == (1, 32, 32, 32)  # 2x upsample of P3 via Proto


@pytest.mark.slow
def test_pose_head_shapes_and_decode():
    xs = _feats()
    head = Pose(nc=1, kpt_shape=(17, 3))
    variables = head.init(jax.random.PRNGKey(0), xs)
    det, kpts = head.apply(variables, xs)
    assert det[0].shape == (1, 16, 16, 64 + 1)
    assert kpts[0].shape == (1, 16, 16, 51)
    decoded = decode_keypoints(kpts, strides=(8, 16, 32), kpt_shape=(17, 3))
    n = 16 * 16 + 8 * 8 + 4 * 4
    assert decoded.shape == (1, n, 17, 3)
    vis = np.asarray(decoded[..., 2])
    assert (vis >= 0).all() and (vis <= 1).all()


@pytest.mark.slow
def test_transformer_blocks():
    from dedark_yolo_tpu.nn.transformer import AIFI, TransformerBlock, MLP
    from dedark_yolo_tpu.nn.layers import C3TR
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32))
    aifi = AIFI(c=32)
    v = aifi.init(jax.random.PRNGKey(0), x)
    assert aifi.apply(v, x).shape == x.shape
    tb = TransformerBlock(c2=32, num_heads=4, n=2)
    v = tb.init(jax.random.PRNGKey(0), x)
    assert tb.apply(v, x).shape == x.shape
    c3tr = C3TR(c2=32, n=1)
    v = c3tr.init(jax.random.PRNGKey(0), x)
    assert c3tr.apply(v, x).shape == (1, 8, 8, 32)
    mlp = MLP(hidden=64, out=4)
    v = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    assert mlp.apply(v, jnp.zeros((2, 16))).shape == (2, 4)


def test_masks_keypoints_containers():
    from dedark_yolo_tpu.engine.results_extra import Masks, Keypoints
    m = np.zeros((2, 16, 16), np.uint8)
    m[0, 4:12, 4:12] = 1
    masks = Masks(m, orig_shape=(64, 64))
    assert len(masks) == 2
    contours = masks.xy
    assert len(contours) == 2 and len(contours[0]) > 0
    assert contours[0][:, 0].max() <= 64
    k = Keypoints(np.zeros((3, 17, 3)), orig_shape=(64, 64))
    assert k.xy.shape == (3, 17, 2) and k.conf.shape == (3, 17)
