"""Ballé-style analysis/synthesis transform stacks shared by the lossy VAEs
(ref rec/models/lossy/large_{1,2,4}_level_vae.py transform layers)."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules import GDN, SignalConv2D


def softplus_scale(log_scale):
    """Positive scale with the reference's 1e-7 floor (shared by all lossy
    models; ref large_2_level_vae.py:337 etc.)."""
    return jax.nn.softplus(log_scale) + 1e-7


def _down(features, kernel, stride, name, use_bias=True, dft=True):
    return SignalConv2D(features=features, kernel=kernel, corr=True,
                        strides_down=stride, padding="reflect",
                        use_bias=use_bias, dft_parametrization=dft, name=name)


def _up(features, kernel, stride, name, use_bias=True, dft=True):
    return SignalConv2D(features=features, kernel=kernel, corr=False,
                        strides_up=stride, padding="reflect",
                        use_bias=use_bias, dft_parametrization=dft, name=name)


class AnalysisTransform(nn.Module):
    """Stack of (downsampling SignalConv + GDN) with posterior stat heads.

    ``stages``: sequence of (kernel, stride); the heads use the last stage's
    geometry (ref large_2_level_vae.py:13-80 uses 4x (5,5)/s2; the 1-level
    model uses (9,9)/s4 + (5,5)/s2 + (5,5)/s2 heads)."""

    num_filters: int
    stages: Sequence[Tuple[int, int]] = ((5, 2), (5, 2), (5, 2))
    head_kernel: int = 5
    head_stride: int = 2
    head_bias: bool = True

    @nn.compact
    def __call__(self, x):
        for i, (k, s) in enumerate(self.stages):
            x = _down(self.num_filters, (k, k), s, f"conv_{i}")(x)
            x = GDN(inverse=False, name=f"gdn_{i}")(x)
        hk = (self.head_kernel, self.head_kernel)
        loc = _down(self.num_filters, hk, self.head_stride,
                    "posterior_loc_head", use_bias=self.head_bias)(x)
        log_scale = _down(self.num_filters, hk, self.head_stride,
                          "posterior_log_scale_head",
                          use_bias=self.head_bias)(x)
        return loc, log_scale


class SynthesisTransform(nn.Module):
    """Mirror stack of (upsampling SignalConv + IGDN) ending in an RGB conv
    (ref large_2_level_vae.py:83-133)."""

    num_filters: int
    stages: Sequence[Tuple[int, int]] = ((5, 2), (5, 2), (5, 2))
    final_kernel: int = 5
    final_stride: int = 2
    out_channels: int = 3

    @nn.compact
    def __call__(self, x):
        for i, (k, s) in enumerate(self.stages):
            x = _up(self.num_filters, (k, k), s, f"conv_{i}")(x)
            x = GDN(inverse=True, name=f"igdn_{i}")(x)
        fk = (self.final_kernel, self.final_kernel)
        return _up(self.out_channels, fk, self.final_stride, "conv_out")(x)


class HyperAnalysisTransform(nn.Module):
    """(3,3)/s1 + relu + (5,5)/s2 + relu + bias-free (5,5)/s2 heads
    (ref large_2_level_vae.py:136-190)."""

    num_filters: int

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(_down(self.num_filters, (3, 3), 1, "conv_0")(x))
        x = jax.nn.relu(_down(self.num_filters, (5, 5), 2, "conv_1")(x))
        loc = _down(self.num_filters, (5, 5), 2, "posterior_loc_head",
                    use_bias=False)(x)
        log_scale = _down(self.num_filters, (5, 5), 2,
                          "posterior_log_scale_head", use_bias=False)(x)
        return loc, log_scale


class HyperSynthesisTransform(nn.Module):
    """2x ((5,5)/s2 up + relu, no DFT parametrization) + (3,3) prior heads
    (ref large_2_level_vae.py:193-252)."""

    num_filters: int
    num_output_filters: int

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(_up(self.num_filters, (5, 5), 2, "conv_0",
                            dft=False)(x))
        x = jax.nn.relu(_up(self.num_filters, (5, 5), 2, "conv_1",
                            dft=False)(x))
        loc = _up(self.num_output_filters, (3, 3), 1, "prior_loc_head",
                  dft=False)(x)
        log_scale = _up(self.num_output_filters, (3, 3), 1,
                        "prior_log_scale_head", dft=False)(x)
        return loc, log_scale


class EmpiricalPrior(nn.Module):
    """Learned spatially-constant empirical-Bayes prior: a (1,1,1,F) base
    tiled to the latent grid, then conv + elu + stat heads
    (ref large_2_level_vae.py:263-313, large_1_level_vae.py:125-155).
    ``return_features=True`` also yields the elu'd features (the 4-level
    model's EmpiricalHyperPrior shape, ref large_4_level_vae.py:542-591)."""

    num_filters: int
    return_features: bool = False

    @nn.compact
    def __call__(self, batch, height, width):
        base = self.param("prior_base", nn.initializers.zeros,
                          (self.num_filters,))
        t = jnp.broadcast_to(base, (batch, height, width, self.num_filters))
        t = _down(self.num_filters, (3, 3), 1, "prior_conv")(t)
        t = jax.nn.elu(t)
        loc = _down(self.num_filters, (3, 3), 1, "prior_loc_head")(t)
        log_scale = _down(self.num_filters, (3, 3), 1,
                          "prior_log_scale_head")(t)
        if self.return_features:
            return loc, log_scale, t
        return loc, log_scale
