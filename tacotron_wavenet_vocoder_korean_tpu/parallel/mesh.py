"""Device mesh + sharding helpers (SPMD data parallelism via jit/pjit).

The reference is single-device (SURVEY.md §2.2); here every train step is
written as a global program over a ``jax.sharding.Mesh`` with the batch axis
sharded over ``data`` — XLA inserts the ICI collectives (psum for gradients)
automatically.  A ``model`` axis is laid down for future tensor parallelism
(the models are small enough that DP is the right tool at this scale).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
