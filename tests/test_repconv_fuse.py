"""RepConv deploy-form re-parameterization (reference conv.py:193-291):
the 3-branch train form (3x3+BN, 1x1+BN, optional id-BN) collapses to ONE
biased 3x3 conv at fuse/export time, numerically equal but with fewer
inference FLOPs — a structural merge XLA's BN folding cannot perform.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Minimal detect graph with a RepC3 (the only RepConv-bearing block in the
# reference zoo, used by the RT-DETR configs).
REP_YAML = {
    "nc": 2,
    "scales": {"n": [0.33, 0.25, 1024]},
    "backbone": [
        [-1, 1, "Conv", [32, 3, 2]],   # 0 P1/2
        [-1, 1, "Conv", [64, 3, 2]],   # 1 P2/4
        [-1, 1, "Conv", [64, 3, 2]],   # 2 P3/8
        [-1, 2, "RepC3", [64, 2]],     # 3
        [-1, 1, "Conv", [128, 3, 2]],  # 4 P4/16
        [-1, 1, "RepC3", [128, 2]],    # 5
        [-1, 1, "Conv", [128, 3, 2]],  # 6 P5/32
    ],
    "head": [
        [[3, 5, 6], 1, "Detect", ["nc"]],  # 7
    ],
}


def _randomized_variables(model, rng, imgsz=64):
    """init, then perturb params AND batch_stats so BN folding is exercised
    with non-trivial running statistics (fresh init has mean=0, var=1)."""
    v = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(rng, len(leaves))
    noised = [
        l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ]
    v = jax.tree_util.tree_unflatten(treedef, noised)
    # variances must stay positive
    bs = jax.tree_util.tree_map(jnp.abs, v["batch_stats"])
    return {"params": v["params"], "batch_stats": bs}


def test_fuse_repconv_numerically_equal():
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.nn.layers import fuse_repconv_variables

    train_model = DetectionModel(dict(REP_YAML))
    v = _randomized_variables(train_model, jax.random.PRNGKey(7))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    b0, s0 = train_model.apply_eval(v, img)

    fused_v = fuse_repconv_variables(v)
    deploy_model = DetectionModel(dict(REP_YAML), repconv_deploy=True)
    b1, s1 = deploy_model.apply_eval(fused_v, img)

    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)

    # structural check: no branch convs or RepConv batch_stats remain
    flat = jax.tree_util.tree_flatten_with_path(fused_v)[0]
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    rep_paths = [p for p in paths if "RepConv" in p]
    assert rep_paths and all("fused" in p for p in rep_paths)
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(v))
    n_deploy = sum(x.size for x in jax.tree_util.tree_leaves(fused_v))
    assert n_deploy < n_train  # genuinely fewer deployed weights


def test_fuse_repconv_id_bn_branch():
    """The optional identity-BN branch (use_id_bn, cin==cout) folds too."""
    import flax.linen as nn

    from dedark_yolo_tpu.nn.layers import RepConv, fuse_repconv_variables

    class Wrap(nn.Module):
        deploy: bool = False

        @nn.compact
        def __call__(self, x, train=False):
            return RepConv(8, use_id_bn=True, deploy=self.deploy)(x, train)

    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, 16, 16, 8)), jnp.float32)
    v = Wrap().init(jax.random.PRNGKey(3), x)
    # make BN stats non-trivial
    bs = jax.tree_util.tree_map(
        lambda l: jnp.abs(l) + 0.3, v["batch_stats"])
    v = {"params": v["params"], "batch_stats": bs}
    y0 = Wrap().apply(v, x)
    y1 = Wrap(deploy=True).apply(fuse_repconv_variables(v), x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)


def test_facade_fuse_and_export_flag(tmp_path):
    """YOLO.fuse() flips a RepConv graph to deploy form in place; the
    exporter's fuse=True flag produces a fused artifact."""
    import yaml

    from dedark_yolo_tpu import YOLO

    ypath = tmp_path / "rep.yaml"
    ypath.write_text(yaml.safe_dump(REP_YAML))
    m = YOLO(str(ypath))
    m._ensure_params(64)
    img = np.random.default_rng(2).uniform(0, 1, (1, 64, 64, 3))
    b0, s0 = m.model.apply_eval(
        {"params": m.params, "batch_stats": m.batch_stats},
        jnp.asarray(img, jnp.float32))

    m.fuse()
    assert m.model.repconv_deploy
    b1, s1 = m.model.apply_eval(
        {"params": m.params, "batch_stats": m.batch_stats},
        jnp.asarray(img, jnp.float32))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-4, atol=1e-3)
    m.fuse()  # idempotent

    # exporter flag on an unfused facade
    m2 = YOLO(str(ypath))
    p = m2.export(format="npz", imgsz=64, batch=1, fuse=True,
                  project=str(tmp_path / "exp"))
    assert Path(p).is_file()
    import numpy as _np
    with _np.load(p, allow_pickle=True) as z:
        assert any("fused" in k for k in z.files)
