"""Orbax checkpointing with the reference's run-dir contract.

Reference semantics preserved (SURVEY.md §5 checkpoint/resume):
  * ``params.json`` written at run start, overlaid on resume/inference
    (utils/__init__.py:143-172)
  * ``--load_path``  : continue, keeping the global step
  * ``--initialize_path``: warm-start weights, step reset to 0
    (train_tacotron.py:177-193)
  * bounded retention (max_to_keep)
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config, save_config, load_config


class CheckpointManager:
    def __init__(self, log_dir: str, max_to_keep: int = 3):
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.log_dir, "ckpt"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        # packed_host_get fetches the whole state in O(#dtypes) transfers;
        # a per-leaf np.asarray costs ~1 s of tunnel latency per leaf and
        # stalled the train loop ~60 s per save
        from ..utils.misc import packed_host_get
        self._mgr.save(step, args=ocp.args.StandardSave(
            packed_host_get(state)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.log_dir}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state))

    def close(self):
        self._mgr.close()


def prepare_run_dir(log_dir: str, cfg: Config) -> None:
    """Create the run dir and persist the config (reference
    utils/__init__.py:100-142)."""
    os.makedirs(log_dir, exist_ok=True)
    save_config(cfg, log_dir)


def load_run_config(load_path: str) -> Config:
    """Overlay config from an existing run dir (reference
    utils/__init__.py:156-172)."""
    return load_config(load_path)


def restore_into_state(task_state, load_path: Optional[str],
                       initialize_path: Optional[str], mgr_cls=CheckpointManager):
    """Apply load/initialize semantics to a freshly-initialized state.

    Returns (state, start_step).  ``load_path`` keeps the saved step;
    ``initialize_path`` warm-starts weights with step 0.
    """
    if load_path and initialize_path:
        raise ValueError("load_path and initialize_path are mutually exclusive "
                         "(reference train_tacotron.py:299-300)")
    if not load_path and not initialize_path:
        return task_state, 0
    src = load_path or initialize_path

    def _host_template(x):
        # shape/dtype metadata only — np.asarray on a device leaf would pay
        # one ~1 s tunnel round-trip per leaf (~10 min for a train state).
        # Accepts concrete arrays and jax.ShapeDtypeStruct alike, so callers
        # resuming a run can pass a jax.eval_shape'd abstract state and skip
        # on-device initialization entirely.
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return np.empty(x.shape, x.dtype)
        return np.asarray(x)

    mgr = mgr_cls(src)
    restored = mgr.restore(jax.tree.map(_host_template, task_state))
    mgr.close()
    if initialize_path:
        restored = restored._replace(step=np.zeros((), np.int32))
    start = 0 if initialize_path else int(restored.step)
    # one bulk transfer per dtype instead of ~1 s of tunnel latency per leaf
    from ..utils.misc import packed_device_put
    return packed_device_put(restored), start
