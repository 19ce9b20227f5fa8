"""Spatial (height-axis) sharded inference for very large images.

A CNN detector has no sequence axis to shard; its large-input scaling axis is
SPATIAL (SURVEY.md §5: "optionally shard H/W of early convs for very large
images"). The reference can only tile big images on the host; here ONE image's
rows are sharded across the mesh and XLA GSPMD partitions every convolution
automatically, inserting the halo exchanges at shard boundaries over ICI —
no manual ghost-cell code, and the result is bit-comparable to single-device
inference.

This turns a v5e pod slice into a single logical device for gigapixel frames:
memory scales 1/n per chip and the conv FLOPs parallelize, with only
halo-width ICI traffic (a few rows per stage).

Usage:
    boxes, scores = spatial_infer(model, variables, img)   # img (1, H, W, 3)

H should be a multiple of 32 * n_devices so every pyramid level divides
evenly across shards (check_imgsz already rounds to /32; spatial_pad_to
rounds to the mesh multiple).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def spatial_pad_to(h, n_devices, stride=32):
    """Smallest height >= h divisible by stride * n_devices."""
    m = stride * int(n_devices)
    return int(-(-h // m) * m)


def spatial_infer(model, variables, img, mesh=None, axis=None):
    """Run eval-mode inference with the image H axis sharded over the mesh.

    model:     DetectionModel (or any YOLOGraph with apply_eval).
    variables: {"params": ..., "batch_stats": ...} (host or device trees).
    img:       (B, H, W, 3) float array in [0, 1]; H must divide
               32 * mesh size (use spatial_pad_to + letterbox fill).
    Returns (boxes, scores) exactly like model.apply_eval, replicated.
    """
    mesh = mesh if mesh is not None else make_mesh()
    axis = axis if axis is not None else mesh.axis_names[0]
    n = mesh.devices.size
    h = img.shape[1]
    assert h % (32 * n) == 0, (
        f"H={h} must divide 32 * {n} devices (use spatial_pad_to)")

    repl = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(None, axis, None, None))

    # cache the jitted partition per (mesh, axis) ON the model: a fresh
    # jax.jit(lambda ...) every call would recompile the full GSPMD graph for
    # every frame of a stream (jit caches by function identity)
    cache = model.__dict__.setdefault("_spatial_jit_cache", {})
    key = (tuple(np.asarray(mesh.devices).ravel().tolist()), axis)
    fn = cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda v, x: model.apply_eval(v, x),
            in_shardings=(repl, row_sharded),
            out_shardings=repl,
        )
        cache[key] = fn
    # device_put is a no-op for arrays already placed with these shardings, so
    # callers streaming frames can pre-place `variables` once
    variables = jax.device_put(variables, repl)
    img = jax.device_put(np.asarray(img), row_sharded)
    return fn(variables, img)
