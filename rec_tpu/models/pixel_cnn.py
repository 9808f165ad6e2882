"""Masked-convolution residual PixelCNN (ref rec/models/pixel_cnn.py).

The reference declares the architecture (7x7 mask-"a" first conv, 1-3-1
mask-"b" bottleneck residual blocks with 0.1 scaling, 1x1 output head) but
leaves ``call`` an unfinished stub (ref pixel_cnn.py:101-102).  This build
completes it: forward returns per-pixel discretized-logistic parameters,
``log_likelihood`` scores images, and ``sample`` generates autoregressively
with a ``lax.scan`` over the pixel grid in the mask's AR order.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .likelihoods import discretized_logistic
from .modules import ReparameterizedConv2D


class PixelCNNResidualBlock(nn.Module):
    """elu -> 1x1 -> elu -> 3x3 -> elu -> 1x1, all mask "b", +0.1 residual
    (ref pixel_cnn.py:8-60)."""

    filters: int
    residual_filter_factor: int = 2

    @nn.compact
    def __call__(self, x):
        t = x
        dims = [(self.filters, (1, 1)), (self.filters, (3, 3)),
                (self.filters * self.residual_filter_factor, (1, 1))]
        for i, (f, k) in enumerate(dims):
            t = jax.nn.elu(t)
            t = ReparameterizedConv2D(features=f, kernel_size=k, mask="b",
                                      name=f"conv_{i}")(t)
        return x + 0.1 * t


class PixelCNN(nn.Module):
    """Full autoregressive density model over images in [-0.5, 0.5].

    ``filters`` must be divisible by the image channel count (the AR masks
    partition features into channel groups); 60 divides 1..6 channels.
    """

    filters: int = 60
    num_residual_blocks: int = 5

    @nn.compact
    def __call__(self, x):
        """Returns (loc, log_scale) of a per-pixel conditional discretized
        logistic; loc is a residual correction around 0."""
        in_ch = x.shape[-1]
        if self.filters % in_ch != 0:
            raise ValueError(
                f"PixelCNN filters ({self.filters}) must be divisible by "
                f"the channel count ({in_ch}) for the autoregressive masks")
        t = ReparameterizedConv2D(features=self.filters, kernel_size=(7, 7),
                                  mask="a", name="first_conv")(x)
        for i in range(self.num_residual_blocks):
            t = PixelCNNResidualBlock(filters=self.filters // 2,
                                      name=f"res_block_{i}")(t)
        t = jax.nn.elu(t)
        # Output heads are mask "b": output channel i reads only feature
        # groups <= i, which (after the mask-"a" first layer) carry
        # information about input channels < i — without the mask every
        # channel's density would condition on the pixel's own value.
        loc = ReparameterizedConv2D(features=in_ch, kernel_size=(1, 1),
                                    mask="b", name="loc_head")(t)
        log_scale = ReparameterizedConv2D(features=in_ch, kernel_size=(1, 1),
                                          mask="b", name="log_scale_head")(t)
        return jnp.tanh(loc) * 0.5, jnp.clip(log_scale, -7.0, 2.0)

    def log_likelihood(self, x):
        loc, log_scale = self(x)
        return discretized_logistic(x, loc, jnp.exp(log_scale))

    def sample(self, key, shape: Tuple[int, int, int]):
        """Autoregressive sampling in the mask's AR order (bottom-to-top,
        right-to-left, channel-by-channel — see
        tests/test_modules.py::test_ar_mask_causality).  O(H*W*C) forward
        passes via scan; fine for small images.  One channel per step:
        channel k's conditional depends on the already-sampled channels < k
        of the same pixel."""
        H, W, C = shape

        def step(carry, idx):
            img, key = carry
            key, sub = jax.random.split(key)
            loc, log_scale = self(img[None])
            u = jax.random.uniform(sub, (), minval=1e-5, maxval=1 - 1e-5)
            val = loc[0] + jnp.exp(log_scale[0]) * (jnp.log(u)
                                                    - jnp.log1p(-u))
            val = jnp.clip(jnp.floor((val + 0.5) * 256.0) / 256.0 - 0.5,
                           -0.5, 0.5 - 1.0 / 256.0)
            # AR order: row r from H-1 down, column c from W-1 down, then
            # channel k ascending within the pixel.
            pix = idx // C
            k = idx % C
            r = H - 1 - pix // W
            c = W - 1 - pix % W
            img = img.at[r, c, k].set(val[r, c, k])
            return (img, key), None

        (img, _), _ = jax.lax.scan(
            step, (jnp.zeros((H, W, C)), key),
            jnp.arange(H * W * C))
        return img
