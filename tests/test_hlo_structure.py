"""Compile-level assertions that the graph optimizations actually change the
lowered program — not just the Python structure.

These inspect optimized HLO text from the CPU backend (the optimizations are
XLA-structural, not backend-specific): concat elision must remove
`concatenate` instructions from the flagship graph, and the ASFF weight
commute must move the 8-channel compress convolutions to pre-upsample
resolution.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dedark_yolo_tpu.nn import layers as L


def _optimized_hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def _asff2_hlo(commute):
    s = 16
    shapes = [(1, s, s, 512), (1, 2 * s, 2 * s, 512), (1, 4 * s, 4 * s, 256)]
    xs = [jnp.zeros(sh, jnp.float32) for sh in shapes]
    mod = L.AsffTribeLevel(level=2, commute_weights=commute)
    v = mod.init(jax.random.PRNGKey(0), xs)
    return _optimized_hlo(lambda *t: mod.apply(v, list(t)), *xs), s


def _count_8col_dots(hlo, rows):
    """Count dot ops producing an f32[rows, 8] output (the CPU backend
    canonicalizes 1x1 convs to 2D dots with spatial dims collapsed)."""
    return len(re.findall(r"f32\[%d,8\]\S* dot\(" % rows, hlo))


@pytest.mark.slow
def test_asff_commute_moves_compress_convs_off_full_res():
    hlo_on, s = _asff2_hlo(True)
    hlo_off, _ = _asff2_hlo(False)
    full_px = (4 * s) * (4 * s)
    # naive: all three 8-ch compress convs contract at the full P3 resolution
    assert _count_8col_dots(hlo_off, full_px) == 3
    # commuted: only the native-res branch (r2) remains at full res; the other
    # two contract at their pre-upsample pixel counts
    assert _count_8col_dots(hlo_on, full_px) == 1
    assert _count_8col_dots(hlo_on, s * s) == 1
    assert _count_8col_dots(hlo_on, (2 * s) * (2 * s)) == 1


@pytest.mark.slow
def test_concat_elision_removes_concatenates_from_flagship():
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel

    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8.yaml")
    d["scale"], d["nc"] = "l", 3
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)

    counts = {}
    entry = L.ELIDE_CONCAT
    try:
        for on in (True, False):
            L.set_concat_elision(on)
            m = DetectionModel(d)
            v = m.init(jax.random.PRNGKey(0), imgsz=64)
            hlo = _optimized_hlo(
                lambda t: m.module.apply(v, t, train=False), img)
            counts[on] = len(re.findall(r" concatenate\(", hlo))
    finally:
        L.set_concat_elision(entry)
    # the flagship has ~20 C2f/SPPF/FPN concats feeding 1x1 convs; elision
    # must remove the bulk of them from the compiled program
    assert counts[True] <= counts[False] - 10, counts


@pytest.mark.slow
def test_concat_elision_reaches_the_backward_pass():
    """Split-K 1x1 convs differentiate into per-input dots, so the TRAIN
    graph (forward + backward) loses concatenate ops too — the optimization
    is not eval-only (measured on CPU HLO: 32 -> 19 at L/64px)."""
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel

    d = model_yaml_load("dedark_yolo_tpu/cfg/models/yolov8.yaml")
    d["scale"], d["nc"] = "l", 3
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    counts = {}
    entry = L.ELIDE_CONCAT
    try:
        for on in (True, False):
            L.set_concat_elision(on)
            m = DetectionModel(d)
            v = m.init(jax.random.PRNGKey(0), imgsz=64)

            def loss(params, bs, t, _m=m):
                raw, _ = _m.apply_train(
                    {"params": params, "batch_stats": bs}, t)
                return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                           for x in jax.tree_util.tree_leaves(raw))

            hlo = (jax.jit(jax.grad(loss))
                   .lower(v["params"], v["batch_stats"], img)
                   .compile().as_text())
            counts[on] = len(re.findall(r" concatenate\(", hlo))
    finally:
        L.set_concat_elision(entry)
    assert counts[True] <= counts[False] - 10, counts
