"""Persistent XLA compilation cache.

Compiles of the scanned 24-block programs cost minutes over the remote-TPU
toolchain; the persistent cache turns cross-process recompiles into
~second-scale loads (measured 49s -> 1.6s).  Called by bench.py, the graft
entry points, and every example CLI before first backend use.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                            ".jax_cache")


def enable_compilation_cache(directory: str | None = None) -> str:
    import jax

    path = os.path.abspath(directory or os.environ.get(
        "REC_TPU_COMPILATION_CACHE", _DEFAULT_DIR))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
