"""Training tasks, checkpointing, drivers."""
from .tacotron_task import TacotronTask, TrainState, batch_to_dict
from .checkpoints import (
    CheckpointManager, prepare_run_dir, load_run_config, restore_into_state,
)

__all__ = [
    "TacotronTask", "TrainState", "batch_to_dict",
    "CheckpointManager", "prepare_run_dir", "load_run_config",
    "restore_into_state",
]
