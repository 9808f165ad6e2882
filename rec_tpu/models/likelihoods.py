"""Reconstruction likelihoods for the lossless models (ref
rec/models/resnet_vae.py:636-685).

Images are normalized to [-0.5, 0.5]; the flagship likelihood is the
discretized logistic with a learned global scale.  Each function maps
(reference, reconstruction, scale) -> per-image log likelihood (nats), summed
over pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

AVAILABLE_LIKELIHOODS = ("discretized_logistic", "gaussian", "laplace",
                         "ms-ssim")


def discretized_logistic(reference, reconstruction, scale,
                         binsize: float = 1.0 / 256.0):
    """P(x in [floor(x/b)*b, +b)) under Logistic(reconstruction, scale)
    (ref resnet_vae.py:644-653 — same floor-discretization and 1e-7 guard)."""
    x = jnp.floor(reference / binsize) * binsize
    x = (x - reconstruction) / scale
    log_p = jax.nn.sigmoid(x + binsize / scale) - jax.nn.sigmoid(x)
    log_p = jnp.log(log_p + 1e-7)
    return jnp.sum(log_p, axis=(-3, -2, -1))


def gaussian(reference, reconstruction, scale):
    z = (reference - reconstruction) / scale
    log_p = -0.5 * jnp.square(z) - jnp.log(scale) - 0.9189385332046727
    return jnp.sum(log_p, axis=(-3, -2, -1))


def laplace(reference, reconstruction, scale):
    log_p = -jnp.abs(reference - reconstruction) / scale - jnp.log(2.0 * scale)
    return jnp.sum(log_p, axis=(-3, -2, -1))


def ms_ssim_pseudo(reference, reconstruction, scale):
    """Pseudo log-likelihood proportional to MS-SSIM (ref
    resnet_vae.py:667-670)."""
    from ..utils.metrics import ms_ssim

    return ms_ssim(reference / scale, reconstruction / scale,
                   max_val=1.0) / scale


def get_likelihood(name: str):
    table = {
        "discretized_logistic": discretized_logistic,
        "gaussian": gaussian,
        "laplace": laplace,
        "ms-ssim": ms_ssim_pseudo,
    }
    if name not in table:
        raise ValueError(
            f"likelihood must be one of {AVAILABLE_LIKELIHOODS}, got {name}")
    return table[name]
