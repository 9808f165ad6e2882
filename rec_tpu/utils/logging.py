"""File/console logging + misc utils (ref rec/core/utils.py)."""

from __future__ import annotations

import logging
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def setup_logger(name: str, level=logging.INFO,
                 log_file: Optional[str] = None,
                 to_console: bool = True) -> logging.Logger:
    """(ref rec/core/utils.py:10-31)"""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s")
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if to_console:
        ch = logging.StreamHandler(sys.stdout)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    return logger


def gaussian_blur(image: jnp.ndarray, kernel_size: int = 5,
                  sigma: float = 1.0) -> jnp.ndarray:
    """Depthwise Gaussian blur, NHWC (ref rec/core/utils.py:34-46)."""
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    k2d = np.outer(g, g).astype(np.float32)
    C = image.shape[-1]
    kernel = jnp.asarray(k2d)[:, :, None, None] * jnp.ones((1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        image, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
