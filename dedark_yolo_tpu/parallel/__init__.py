from .mesh import (make_mesh, batch_sharding, replicated, shard_batch, replicate)
from .spatial import spatial_infer, spatial_pad_to

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate", "spatial_infer", "spatial_pad_to"]
