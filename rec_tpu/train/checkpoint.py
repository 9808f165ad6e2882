"""Checkpointing of the full TrainState (step/params/optimizer/EMA/beta —
the same contents as ref tf.train.Checkpoint, train_generative_model.py:
364-370), keeping the newest 3 (ref max_to_keep=3).

Backend: flax msgpack serialization with atomic renames.  (Orbax's async
CheckpointManager deadlocks under the axon remote-TPU platform used for
development; the states here are small and replicated, so simple
synchronous serialization is strictly better.  The API is unchanged, so an
Orbax backend can be swapped back in for multi-host sharded states.)
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Optional

import jax
from flax import serialization

from .state import TrainState

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")
_MODEL_CONFIG = "model_config.json"


def save_model_config(directory: str, kind: str, cfg) -> None:
    """Persist the model family + architecture config next to the
    checkpoints, so eval CLIs can detect (and correct) a config mismatch.

    Motivation: flax restore maps by tree structure, so a checkpoint
    trained with one likelihood/config restores SILENTLY onto a model
    built with another (same param tree), and every downstream metric is
    garbage — observed as a laplace-trained LargeResNetVAE evaluated as
    discretized_logistic reporting a constant 16 bpd NLL."""
    os.makedirs(directory, exist_ok=True)
    cfg_dict = (dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg)
                else dict(cfg))
    with open(os.path.join(directory, _MODEL_CONFIG), "w") as f:
        json.dump({"kind": kind, "cfg": cfg_dict}, f, indent=2)


def load_model_config(directory: str) -> Optional[dict]:
    """The persisted {"kind", "cfg"} dict, or None (pre-existing dirs)."""
    path = os.path.join(directory, _MODEL_CONFIG)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def reconcile_model_config(directory: str, kind: str, cfg, log=None):
    """Return ``cfg`` corrected to the persisted training config.

    If the checkpoint directory records a model config and it differs from
    the caller's, the TRAINED config wins (evaluating a checkpoint with a
    different architecture/likelihood is never right) and a warning names
    every overridden field.  Tuple-typed fields survive the JSON round
    trip (lists are converted back per the dataclass field types)."""
    saved = load_model_config(directory)
    if saved is None or saved.get("kind") != kind:
        return cfg
    current = dataclasses.asdict(cfg)
    overrides = {}
    for f in dataclasses.fields(cfg):
        if f.name not in saved["cfg"]:
            continue
        v = saved["cfg"][f.name]
        if isinstance(getattr(cfg, f.name), tuple) and isinstance(v, list):
            v = tuple(v)
        if current.get(f.name) != v:
            overrides[f.name] = v
    if overrides:
        msg = (f"checkpoint {directory} was trained with "
               f"{overrides} — overriding the requested model config "
               f"to match (a structural-silent mismatch poisons every "
               f"metric)")
        (log.warning if log else print)(msg)
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)

    def _steps(self):
        steps = []
        for name in os.listdir(self.directory):
            m = _CKPT_RE.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}.msgpack")

    def save(self, state: TrainState) -> None:
        state = jax.device_get(state)
        step = int(state.step)
        data = serialization.to_bytes(state)
        tmp = self._path(step) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, self._path(step))  # atomic
        for old in self._steps()[: -self.max_to_keep]:
            os.remove(self._path(old))

    def restore(self, template: TrainState) -> Optional[TrainState]:
        """Restore the latest checkpoint onto ``template``'s structure, or
        None if no checkpoint exists (restore-on-start, ref :419-429).

        The restored state is committed to the default device(s): msgpack
        deserializes to HOST numpy arrays, and feeding those to a jitted
        function re-uploads them on EVERY call — measured at ~3 s/call for
        the flagship's ~23M params over the remote-device tunnel (vs 36 ms
        once resident).  Callers that want a specific sharding re-place the
        result (training does, with replicated_sharding)."""
        steps = self._steps()
        if not steps:
            return None
        with open(self._path(steps[-1]), "rb") as f:
            state = serialization.from_bytes(template, f.read())
        return jax.device_put(state)

    def restore_params(self, params_template) -> Optional[dict]:
        """Eval-path restore: params + EMA params only.

        Evaluation must not depend on the TRAINING optimizer's state tree
        (it changes with settings like gradient clipping, which wraps
        opt_state in an extra chain level); a full-state template restore
        then fails on a structural mismatch even though the params are
        fine.  Deserializes the raw msgpack and maps only the params/EMA
        subtrees onto the template.  Returns
        ``{"step", "params", "ema_params"}`` on device, or None."""
        steps = self._steps()
        if not steps:
            return None
        with open(self._path(steps[-1]), "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        out = {
            "step": int(raw["step"]),
            "params": serialization.from_state_dict(params_template,
                                                    raw["params"]),
            "ema_params": serialization.from_state_dict(params_template,
                                                        raw["ema_params"]),
        }
        return jax.device_put(out)

    @property
    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None
