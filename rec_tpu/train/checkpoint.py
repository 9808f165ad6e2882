"""Orbax checkpointing of the full TrainState (step/params/optimizer/EMA/beta
— the same contents as ref tf.train.Checkpoint, train_generative_model.py:
364-370), keeping the newest 3 (ref max_to_keep=3)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, state: TrainState) -> None:
        self._mgr.save(int(state.step),
                       args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, template: TrainState) -> Optional[TrainState]:
        """Restore the latest checkpoint onto ``template``'s structure, or
        None if no checkpoint exists (restore-on-start, ref :419-429)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
