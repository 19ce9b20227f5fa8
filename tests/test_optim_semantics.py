"""Optimizer-semantics tests: summed gradient accumulation and gated EMA.

Reference semantics under test:
  - the loss is pre-scaled by batch_size (loss.sum()*bs, loss.py:193), so the
    reference's backward over `accumulate` micro-batches SUMS grads and
    optimizer_step applies the sum undivided (trainer.py:340-345);
  - ModelEMA.update runs only inside optimizer_step, so with accumulation the
    EMA ramp advances once per APPLIED step, not per micro-batch
    (torch_utils.py:358-366).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dedark_yolo_tpu.engine.optim import (OptState, init_opt_state, opt_update,
                                          label_params)


def _tiny_params():
    return {"w": jnp.ones((4, 4), jnp.float32) * 0.5,
            "bias": jnp.zeros((4,), jnp.float32)}


def test_accumulation_sums_grads():
    """Two micro-batches with accumulate=2 must equal one step on the SUMMED
    grad (not the mean)."""
    params = _tiny_params()
    labels = label_params(params)
    g1 = {"w": jnp.full((4, 4), 0.1), "bias": jnp.full((4,), 0.2)}
    g2 = {"w": jnp.full((4, 4), 0.3), "bias": jnp.full((4,), 0.4)}
    kw = dict(kind="sgd", lr_bias=jnp.float32(0.1), lr=jnp.float32(0.1),
              momentum=jnp.float32(0.0), weight_decay=0.0, nesterov=False)

    # accumulate=2 path
    st = init_opt_state(params)
    p, st, applied1 = opt_update(params, g1, st, labels, accumulate=2, **kw)
    assert not bool(applied1)
    assert np.allclose(np.asarray(p["w"]), 0.5)  # no update yet
    p, st, applied2 = opt_update(p, g2, st, labels, accumulate=2, **kw)
    assert bool(applied2)

    # single step on the sum
    st_ref = init_opt_state(params)
    gsum = jax.tree_util.tree_map(lambda a, b: a + b, g1, g2)
    p_ref, _, _ = opt_update(params, gsum, st_ref, labels, accumulate=1, **kw)

    for k in ("w", "bias"):
        np.testing.assert_allclose(np.asarray(p[k]), np.asarray(p_ref[k]),
                                   rtol=1e-6)


def test_applied_flag_cadence():
    params = _tiny_params()
    labels = label_params(params)
    g = {"w": jnp.full((4, 4), 0.01), "bias": jnp.full((4,), 0.01)}
    st = init_opt_state(params)
    kw = dict(kind="sgd", lr_bias=jnp.float32(0.01), lr=jnp.float32(0.01),
              momentum=jnp.float32(0.9), weight_decay=0.0)
    flags = []
    p = params
    for _ in range(6):
        p, st, applied = opt_update(p, g, st, labels, accumulate=3, **kw)
        flags.append(bool(applied))
    assert flags == [False, False, True, False, False, True]
    assert int(st.step) == 2  # applied-update count


def test_ema_gated_on_applied():
    """Mirror the trainer's lax.cond gating: EMA updates advance only on
    applied steps and track batch_stats alongside params."""
    from dedark_yolo_tpu.utils import ema_init, ema_update

    params = _tiny_params()
    stats = {"mean": jnp.zeros((4,))}
    labels = label_params(params)
    g = {"w": jnp.full((4, 4), 0.05), "bias": jnp.full((4,), 0.05)}
    st = init_opt_state(params)
    ema = {"params": ema_init(params), "batch_stats": ema_init(stats)}
    emu = jnp.zeros((), jnp.int32)
    kw = dict(kind="sgd", lr_bias=jnp.float32(0.1), lr=jnp.float32(0.1),
              momentum=jnp.float32(0.0), weight_decay=0.0)
    p = params
    for i in range(4):
        p, st, applied = opt_update(p, g, st, labels, accumulate=2, **kw)
        cur = {"params": p, "batch_stats": stats}
        ema, emu = jax.lax.cond(applied,
                                lambda t: ema_update(t[0], cur, t[1]),
                                lambda t: t, (ema, emu))
    assert int(emu) == 2  # 4 micro-steps / accumulate 2
    assert set(ema.keys()) == {"params", "batch_stats"}


def test_weight_decay_scaling_in_trainer():
    """BaseTrainer.build_optimizer scales decay by batch*accumulate/nbs
    (reference trainer.py:249)."""
    from dedark_yolo_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer.__new__(DetectionTrainer)  # skip dataset setup
    from dedark_yolo_tpu.cfg import get_cfg, DEFAULT_CFG_DICT
    t.args = get_cfg(DEFAULT_CFG_DICT, {"batch": 16, "nbs": 64,
                                        "weight_decay": 0.0005,
                                        "optimizer": "sgd", "epochs": 100})
    t.data = {"nc": 3}
    t.build_optimizer(nb=100)
    assert t.accumulate == 4
    np.testing.assert_allclose(t.weight_decay, 0.0005 * 16 * 4 / 64)
