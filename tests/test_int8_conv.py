"""W8A8 Pallas conv kernel (ops/pallas/int8_conv.py): bit parity with the
XLA int32-accumulation reference in interpret mode. The performance side
lives in scripts/int8_probe.py (real-chip only)."""

import numpy as np
import pytest


def _run(B, H, W, C, Co, th, seed=0):
    import jax.numpy as jnp
    from dedark_yolo_tpu.ops.pallas.int8_conv import (
        conv3x3_s1_w8a8, conv3x3_s1_w8a8_reference)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-128, 127, (B, H + 2, W + 2, C),
                                 dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 127, (3, 3, C, Co), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(1e-5, 1e-3, Co).astype(np.float32))
    out = conv3x3_s1_w8a8(x, w, scale, th=th, interpret=True)
    ref = conv3x3_s1_w8a8_reference(x, w, scale)
    return np.asarray(out), np.asarray(ref)


def test_int8_conv_bit_parity():
    out, ref = _run(B=2, H=8, W=10, C=128, Co=128, th=4)
    assert out.shape == ref.shape == (2, 8, 10, 128)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_int8_conv_tap_formulations_agree():
    import jax.numpy as jnp
    from dedark_yolo_tpu.ops.pallas.int8_conv import (
        conv3x3_s1_w8a8, conv3x3_s1_w8a8_reference)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(-128, 127, (1, 10, 11, 64), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 127, (3, 3, 64, 128), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(1e-5, 1e-3, 128).astype(np.float32))
    ref = conv3x3_s1_w8a8_reference(x, w, scale)
    for taps in (1, 3, 9):
        out = conv3x3_s1_w8a8(x, w, scale, th=4, taps=taps, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), ref, err_msg=f"taps={taps}")


def test_int8_conv_multi_co_tiles():
    # Co=512 exercises the output-channel grid axis (tco=256 -> 2 steps)
    out, ref = _run(B=1, H=4, W=6, C=64, Co=512, th=2)
    np.testing.assert_array_equal(out, ref)


def test_int8_conv_saturates():
    import jax.numpy as jnp
    from dedark_yolo_tpu.ops.pallas.int8_conv import conv3x3_s1_w8a8
    x = jnp.full((1, 6, 6, 128), 127, jnp.int8)
    w = jnp.full((3, 3, 128, 128), 127, jnp.int8)
    out = conv3x3_s1_w8a8(x, w, jnp.ones((128,), jnp.float32), th=4,
                          interpret=True)
    assert int(np.asarray(out).max()) == 127


def test_int8_conv_fused_silu_parity():
    import jax.numpy as jnp
    from dedark_yolo_tpu.ops.pallas.int8_conv import (
        conv3x3_s1_w8a8, conv3x3_s1_w8a8_reference)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(-128, 127, (1, 10, 12, 64), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 127, (3, 3, 64, 128), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(1e-5, 5e-4, 128).astype(np.float32))
    out = conv3x3_s1_w8a8(x, w, scale, out_scale=0.05, th=4, act="silu",
                          interpret=True)
    ref = conv3x3_s1_w8a8_reference(x, w, scale, out_scale=0.05, act="silu")
    # silu runs through different f32 op orders; allow 1 ulp of int8
    d = np.abs(np.asarray(out).astype(int) - np.asarray(ref).astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.01
