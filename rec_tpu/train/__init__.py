"""Training loops, state, checkpointing."""

from .checkpoint import CheckpointManager
from .state import (TrainState, ema_update, init_state, make_optimizer,
                    staircase_schedule)

__all__ = ["TrainState", "init_state", "make_optimizer",
           "staircase_schedule", "ema_update", "CheckpointManager"]
