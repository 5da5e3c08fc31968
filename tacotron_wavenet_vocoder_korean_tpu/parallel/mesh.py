"""Device mesh + sharding helpers (SPMD data + tensor parallelism via jit).

The reference is single-device (SURVEY.md §2.2); here every train step is
written as a global program over a ``jax.sharding.Mesh`` with the batch axis
sharded over ``data`` — XLA inserts the ICI collectives (psum for gradients)
automatically.  The ``model`` axis carries tensor parallelism: regex rules
over param-tree paths (``tree_shardings``) place Megatron-style column/row
splits on the wide matmuls, and XLA's sharding propagation inserts the
all-reduces.  The WaveNet skip/post stack is wired this way
(train/wavenet_task.py WAVENET_TP_RULES); DP remains the right default at
these model sizes.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

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


def _spec_fits(mesh: Mesh, spec: P, shape: Tuple[int, ...]) -> bool:
    """A spec is usable iff it has no more axes than the array and every
    named mesh axis divides the corresponding dim."""
    if len(spec) > len(shape):
        return False
    for dim, name in zip(shape, spec):
        if name is None:
            continue
        names = name if isinstance(name, tuple) else (name,)
        size = int(np.prod([mesh.shape[n] for n in names]))
        if dim % size != 0:
            return False
    return True


def tree_shardings(mesh: Mesh, tree, rules: Sequence[Tuple[str, P]],
                   default: P = P()):
    """NamedSharding tree for ``tree`` from regex rules over leaf paths.

    ``rules`` is an ordered list of ``(pattern, PartitionSpec)``; the first
    pattern that ``re.search``-matches ``jax.tree_util.keystr(path)`` AND
    whose spec is shape-compatible with the leaf wins (so a rule written
    for a 2-D kernel safely skips its 1-D weight-norm ``_g`` companion).
    Falls back to ``default`` (replicated).  Because optimizer-moment trees
    (Adam mu/nu, EMA shadows) embed the param names in their paths, one
    rule set shards params, moments, and EMA consistently — pass the whole
    train state.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)

    def spec_for(path, leaf) -> P:
        s = jax.tree_util.keystr(path)
        shape = getattr(leaf, "shape", ())
        for pat, spec in rules:
            if re.search(pat, s) and _spec_fits(mesh, spec, shape):
                return spec
        return default

    return jax.tree_util.tree_unflatten(
        treedef,
        [NamedSharding(mesh, spec_for(p, leaf)) for p, leaf in flat])


def shard_tree(mesh: Mesh, tree, shardings):
    """Device-put ``tree`` leaf-wise onto a matching sharding tree."""
    return jax.tree.map(jax.device_put, tree, shardings)
