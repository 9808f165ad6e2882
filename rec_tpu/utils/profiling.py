"""Tracing / profiling utilities (SURVEY.md §5.1 — the reference has only
wall-clock timers; this build adds jax.profiler traces + phase timers)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


def device_fence(tree) -> None:
    """Reliable device-completion barrier for timing boundaries.

    ``jax.block_until_ready`` can return before device completion over
    remote-device transports (observed on the axon tunnel: a 25 ms encode
    "completed" in 60 us), silently turning wall-clock timers into
    dispatch-rate measurements.  Materializing bytes on the host is the
    one barrier a transport cannot fake.  One element of every device
    leaf is summed into a single scalar ON DEVICE (async dispatches) and
    that scalar is fetched with ONE blocking transfer — fencing a
    many-leaf tree costs one host round trip, not one per leaf.
    """
    import jax.numpy as jnp

    acc = None
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            # size-0 leaves would broadcast the accumulator to shape (0,)
            # and silently skip the blocking fetch.
            v = jnp.reshape(leaf, (-1,))[:1].astype(jnp.float32)
            acc = v if acc is None else acc + v
    if acc is not None:
        np.asarray(acc)


class PhaseTimer:
    """Accumulating per-phase wall-clock timer; pass the phase's device
    outputs as ``sync`` so device work is fenced at phase exit."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                device_fence(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1000.0 * self.totals[k] / self.counts[k]}
                for k in self.totals}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA device trace via jax.profiler; view with TensorBoard or xprof."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
