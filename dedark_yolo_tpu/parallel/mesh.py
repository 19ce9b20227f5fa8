"""Device mesh + sharding rules: the TPU-native replacement for DDP/NCCL.

The reference scales via torch DDP — subprocess re-exec, NCCL process groups,
implicit gradient allreduce (ultralytics/engine/trainer.py:174-201, utils/dist.py).
Here parallelism is declarative: one jax.sharding.Mesh over all chips with a
'data' axis; parameters are replicated, the batch is sharded over 'data', and a
single jitted train step lets XLA SPMD insert the gradient all-reduce over ICI.
Multi-host runs use jax.distributed.initialize + per-host input sharding by
jax.process_index() (the DataLoader's process_index/process_count arguments).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, shape=None, axes=("data",)):
    """Create a Mesh over the given (default: all) devices.

    shape defaults to (len(devices),) on a single 'data' axis. Multi-axis shapes
    (e.g. ('data', 'model')) are accepted for future tensor-parallel layouts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axes))


def batch_sharding(mesh, axis="data"):
    """Sharding for a batch pytree: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    """Sharding for parameters/optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis="data", spatial_axis="spatial"):
    """Device_put a host batch dict with the batch dim sharded over `axis`.

    Multi-process (mesh spans non-addressable devices): each process passes
    its LOCAL rows — the DataLoader already shards the dataset by
    process_index — and the global array is assembled from process-local data
    (the jax replacement for DistributedSampler + DDP input scatter). The effective
    global batch is per-process batch x process_count, matching the
    reference's per-GPU batch convention.

    2-D data x spatial meshes (``make_mesh(shape=(dp, sp), axes=('data',
    'spatial'))``): image leaves — ndim==4 (B, H, W, C) with H divisible by
    the spatial axis size — are additionally sharded over `spatial_axis` on
    the row dim. XLA GSPMD then partitions every convolution spatially,
    inserting halo exchanges at shard boundaries (same mechanism as
    spatial_infer), which cuts per-chip activation memory by 1/sp in the
    TRAINING step too. Label leaves (ndim<4) stay batch-sharded only.
    """
    sp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(spatial_axis, 1)

    def spec(path, x):
        # spatial sharding applies ONLY to image leaves, identified by key
        # (a shape sniff also matches e.g. pose keypoints (B, nb, nk, 3),
        # which would shard the instance dim and force GSPMD reshards)
        key = str(getattr(path[-1], "key", "")) if path else ""
        x = np.asarray(x) if not hasattr(x, "shape") else x
        if (sp > 1 and key.endswith("img") and getattr(x, "ndim", 0) == 4
                and x.shape[1] % sp == 0):
            return NamedSharding(mesh, P(axis, spatial_axis))
        return NamedSharding(mesh, P(axis))

    tmap = jax.tree_util.tree_map_with_path
    if jax.process_count() > 1:
        def put(path, x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(spec(path, x), x)
        return tmap(put, batch)
    return tmap(lambda path, x: jax.device_put(x, spec(path, x)), batch)


def replicate(mesh, tree):
    """Device_put a pytree fully replicated over the mesh.

    Multi-process: every process holds the full value (replicated spec), so
    process-local data IS the per-device shard everywhere.
    """
    sh = replicated(mesh)
    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
