"""Autobatch: fit the global batch size to device memory.

Reference: ultralytics/utils/autobatch.py:32 fits batch to 67% of CUDA memory by
measuring a few batch sizes and polyfitting. Here we use XLA's own compile-time
memory analysis: compile the train step at two batch sizes, solve the linear
model mem(b) = fixed + b * per_image, and pick the largest b within the target
fraction of HBM. No trial allocations needed — memory_analysis is exact for a
static-shape graph.
"""

from __future__ import annotations

import jax

from . import LOGGER

V5E_HBM_BYTES = 16 * 1024 ** 3  # per-chip default if memory_stats unavailable


def device_memory_limit():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
                   or V5E_HBM_BYTES)
    except Exception:
        return V5E_HBM_BYTES


def _step_memory(step_fn, example_args_fn, batch):
    lowered = jax.jit(step_fn).lower(*example_args_fn(batch))
    analysis = lowered.compile().memory_analysis()
    if analysis is None:
        return None
    return (analysis.temp_size_in_bytes + analysis.argument_size_in_bytes +
            analysis.output_size_in_bytes)


def autobatch(step_fn, example_args_fn, fraction=0.67, divisor=8, max_batch=512):
    """Pick the largest batch whose predicted memory stays under fraction*HBM.

    step_fn(*example_args_fn(batch)) must be jittable at any batch size.
    Returns a multiple of `divisor`.
    """
    limit = device_memory_limit() * fraction
    try:
        m1 = _step_memory(step_fn, example_args_fn, divisor)
        m2 = _step_memory(step_fn, example_args_fn, divisor * 2)
    except Exception as e:
        LOGGER.info(f"autobatch measurement failed ({e}); defaulting to 16")
        return 16
    if m1 is None or m2 is None:
        LOGGER.info("autobatch: memory analysis unavailable; defaulting to 16")
        return 16
    per_img = max((m2 - m1) / divisor, 1.0)
    fixed = m1 - per_img * divisor
    b = int((limit - fixed) / per_img)
    b = max(divisor, min(max_batch, (b // divisor) * divisor))
    LOGGER.info(f"autobatch: fixed={fixed / 1e9:.2f}GB per_img={per_img / 1e6:.1f}MB "
                f"-> batch {b} ({fraction:.0%} of {limit / fraction / 1e9:.0f}GB)")
    return b
