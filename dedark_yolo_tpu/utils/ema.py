"""Exponential moving average of parameters.

Reference: ultralytics/utils/torch_utils.py:344-377 (ModelEMA) —
decay(x) = base_decay * (1 - exp(-updates / tau)), base 0.9999, tau 2000.
Pure-functional: state is (ema_params, updates); update is jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # must COPY: the trainer donates both params and ema buffers to the jitted
    # step; aliasing them would donate the same buffer twice
    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


def ema_decay(updates, base_decay=0.9999, tau=2000.0):
    return base_decay * (1.0 - jnp.exp(-updates / tau))


def ema_update(ema_params, params, updates, base_decay=0.9999, tau=2000.0):
    """One EMA step; returns (new_ema, new_updates)."""
    updates = updates + 1
    d = ema_decay(updates, base_decay, tau)
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params)
    return new_ema, updates
