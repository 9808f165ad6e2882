"""Metrics/observability: TensorBoard scalars + JSONL fallback.

Parity with the reference's TensorBoard summaries (loss, NLL, KL total and
per block, bpp, images — ref train_generative_model.py:458-506).  Uses
torch.utils.tensorboard when available (torch-cpu is in the image); always
mirrors scalars to ``metrics.jsonl`` for machine reading.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class SummaryWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._tb = TBWriter(log_dir)
        except Exception:
            self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time()}
        for k, v in values.items():
            v = float(v)
            rec[k] = v
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def images(self, step: int, tag: str, images) -> None:
        if self._tb is not None:
            import numpy as np

            arr = np.clip(np.asarray(images), 0.0, 1.0)
            self._tb.add_images(tag, arr, step, dataformats="NHWC")

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
