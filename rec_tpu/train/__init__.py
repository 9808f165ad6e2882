"""Training loops, state, checkpointing."""

from .checkpoint import (CheckpointManager, load_model_config,
                         reconcile_model_config, save_model_config)
from .state import (TrainState, ema_update, init_state, make_optimizer,
                    staircase_schedule)

__all__ = ["TrainState", "init_state", "make_optimizer",
           "staircase_schedule", "ema_update", "CheckpointManager",
           "save_model_config", "load_model_config",
           "reconcile_model_config"]
