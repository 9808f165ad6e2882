"""Image quality metrics in pure JAX: PSNR, SSIM, MS-SSIM.

The reference leans on tf.image.ssim_multiscale for its ms-ssim likelihood and
lossy eval (ref resnet_vae.py:667-670, compress_with_lossy_model.py); here the
standard Wang et al. multi-scale SSIM is implemented directly: per-scale SSIM
with an 11x11 Gaussian window (sigma 1.5), 2x average-pool downsampling, and
the canonical five scale weights.  All ops are depthwise convs + elementwise
math, so the metrics are jittable and usable as training losses.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over (H, W, C); batched over leading axes."""
    mse = jnp.mean(jnp.square(a - b), axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Depthwise VALID filtering, NHWC."""
    C = x.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None] * jnp.ones((1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _ssim_per_scale(a, b, max_val, k1=0.01, k2=0.03, size=11, sigma=1.5
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean luminance term, mean contrast-structure term)."""
    kernel = _gaussian_kernel(size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _filter2d(a, kernel)
    mu_b = _filter2d(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _filter2d(a * a, kernel) - mu_aa
    sigma_bb = _filter2d(b * b, kernel) - mu_bb
    sigma_ab = _filter2d(a * b, kernel) - mu_ab

    lum = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    axes = (-3, -2, -1)
    return jnp.mean(lum * cs, axis=axes), jnp.mean(cs, axis=axes)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling with reflect-pad to even size, NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, h % 2), (0, w % 2), (0, 0)],
                mode="edge")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1,) * (x.ndim - 3) + (2, 2, 1),
        (1,) * (x.ndim - 3) + (2, 2, 1), "VALID") / 4.0


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Single-scale SSIM, batched over leading axes (NHWC)."""
    ssim_val, _ = _ssim_per_scale(a, b, max_val)
    return ssim_val


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
            weights=_MSSSIM_WEIGHTS) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003).  Needs H, W >= 11 * 2^(scales-1)
    after the usual 5 scales; callers with smaller images pass fewer
    weights."""
    weights = jnp.asarray(weights)
    mcs = []
    lum_cs = None
    for i in range(len(weights)):
        lum_cs, cs = _ssim_per_scale(a, b, max_val)
        if i < len(weights) - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            a, b = _avg_pool2(a), _avg_pool2(b)
    terms = jnp.stack(mcs + [jnp.maximum(lum_cs, 0.0)], axis=0)
    w = weights.reshape((-1,) + (1,) * (terms.ndim - 1))
    return jnp.prod(terms ** w, axis=0)


def ms_ssim_db(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0
               ) -> jnp.ndarray:
    """-10 log10(1 - MS-SSIM), the reference's reporting scale
    (ref README.md:121)."""
    return -10.0 * jnp.log10(jnp.maximum(1.0 - ms_ssim(a, b, max_val), 1e-10))
