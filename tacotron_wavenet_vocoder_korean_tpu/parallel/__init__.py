"""Mesh/sharding utilities for SPMD training."""
from .mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding, replicated,
    shard_batch, replicate, tree_shardings, shard_tree,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate", "tree_shardings", "shard_tree",
]
