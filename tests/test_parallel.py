"""Mesh/sharding tests on the 8-virtual-device CPU platform."""

import importlib.util
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from dedark_yolo_tpu.parallel import make_mesh, shard_batch, replicate, batch_sharding


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(shape=(2,))
    assert mesh2.devices.size == 2


def test_shard_and_replicate():
    mesh = make_mesh()
    batch = {"img": np.zeros((8, 16, 16, 3), np.uint8),
             "cls": np.zeros((8, 4), np.float32)}
    dev = shard_batch(mesh, batch)
    sh = dev["img"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), ndim=dev["img"].ndim)
    params = {"w": jnp.ones((4, 4))}
    rep = replicate(mesh, params)
    assert rep["w"].sharding.is_fully_replicated


def test_grad_allreduce_semantics():
    """Params replicated + batch sharded: the grad equals the full-batch grad."""
    mesh = make_mesh()
    w = jnp.ones((4,))
    x = jnp.arange(32.0).reshape(8, 4)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, x)
    xd = jax.device_put(x, batch_sharding(mesh))
    wd = replicate(mesh, w)
    g_sharded = jax.jit(jax.grad(loss))(wd, xd)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-6)
    assert g_sharded.sharding.is_fully_replicated


def test_dryrun_multichip_entrypoint():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # asserts finite loss internally
