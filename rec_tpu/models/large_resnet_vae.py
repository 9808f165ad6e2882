"""Large ResNet VAE — lossless model for big images (Kodak/CLIC scale).

Parity target: ref rec/models/large_resnet_vae_new.py (the variant the eval
script uses).  Two stochastic bidirectional blocks with aggressive
downsampling:

    x --[4x (5,5)/s2 conv (+GDN/elu)]--> /16 --[res block 1: 128 stoch]-->
      --[(3,3)/s1 + 2x (5,5)/s2]--> /64 --[res block 2: 32 stoch, top]-->

Generative pass mirrors upward from an h_top base at /64.  Reuses the
scanned-RVAE block modules standalone (InferBlock/GenBlock single calls) and
the same REC coding integration; ``compress``/``decompress`` are complete
(ref large_resnet_vae_new.py:557-648).

Likelihoods include the large-model extensions: amplified gaussian/laplace,
optional blurred laplace, ms-ssim with unit power factors, and the 0.84
ms-ssim + laplace combination (ref :409-433).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..coding.gauss import GaussianParams, kl_divergence
from ..utils.logging import gaussian_blur
from ..utils.metrics import ms_ssim
from .modules import (GDN, ReparameterizedConv2D,
                      ReparameterizedConv2DTranspose, SignalConv2D,
                      lower_bound)
from .resnet_vae import GenBlock, InferBlock, ResNetVAEConfig


@dataclasses.dataclass(frozen=True)
class LargeResNetVAEConfig:
    first_deterministic_filters: int = 160
    second_deterministic_filters: int = 160
    first_stochastic_filters: int = 128
    second_stochastic_filters: int = 32
    kernel_size: Tuple[int, int] = (3, 3)
    use_gdn: bool = True
    use_sig_convs: bool = True
    likelihood: str = "discretized_logistic"
    # discretized_logistic | gaussian | laplace | ms-ssim | ms-ssim-laplace
    likelihood_log_scale_init: float = 0.0


class _DownStack(nn.Module):
    """n stages of (5,5)/s2 conv + GDN-or-elu (ref first/second infer
    blocks)."""

    filters: int
    stages: int
    use_gdn: bool
    use_sig: bool
    lead_3x3: bool = False

    @nn.compact
    def __call__(self, x):
        if self.lead_3x3:
            conv = (SignalConv2D(features=self.filters, kernel=(3, 3),
                                 corr=True, strides_down=1, name="conv_pre")
                    if self.use_sig else
                    ReparameterizedConv2D(features=self.filters,
                                          kernel_size=(3, 3), name="conv_pre"))
            x = jax.nn.elu(conv(x))
        for i in range(self.stages):
            conv = (SignalConv2D(features=self.filters, kernel=(5, 5),
                                 corr=True, strides_down=2, name=f"conv_{i}")
                    if self.use_sig else
                    ReparameterizedConv2D(features=self.filters,
                                          kernel_size=(5, 5), strides=(2, 2),
                                          name=f"conv_{i}"))
            x = conv(x)
            x = (GDN(inverse=False, name=f"gdn_{i}")(x)
                 if self.use_gdn else jax.nn.elu(x))
        return x


class _UpStack(nn.Module):
    filters: int
    stages: int
    out_filters: int
    use_gdn: bool
    use_sig: bool
    tail_3x3: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.stages):
            last = (i == self.stages - 1) and not self.tail_3x3
            feats = self.out_filters if last else self.filters
            conv = (SignalConv2D(features=feats, kernel=(5, 5), corr=False,
                                 strides_up=2, name=f"conv_{i}")
                    if self.use_sig else
                    ReparameterizedConv2DTranspose(
                        features=feats, kernel_size=(5, 5), strides=(2, 2),
                        name=f"conv_{i}"))
            x = conv(x)
            if not last:
                x = (GDN(inverse=True, name=f"igdn_{i}")(x)
                     if self.use_gdn else jax.nn.elu(x))
        if self.tail_3x3:
            conv = (SignalConv2D(features=self.out_filters, kernel=(3, 3),
                                 corr=False, strides_up=1, name="conv_tail")
                    if self.use_sig else
                    ReparameterizedConv2DTranspose(
                        features=self.out_filters, kernel_size=(3, 3),
                        strides=(1, 1), name="conv_tail"))
            x = conv(x)
        return x


class LargeResNetVAE(nn.Module):
    cfg: LargeResNetVAEConfig = LargeResNetVAEConfig()
    coder: Any = None

    def setup(self):
        c = self.cfg
        block_cfg_1 = ResNetVAEConfig(
            num_res_blocks=1,
            deterministic_filters=c.first_deterministic_filters,
            stochastic_filters=c.first_stochastic_filters,
            kernel_size=c.kernel_size)
        block_cfg_2 = ResNetVAEConfig(
            num_res_blocks=1,
            deterministic_filters=c.second_deterministic_filters,
            stochastic_filters=c.second_stochastic_filters,
            kernel_size=c.kernel_size)
        self.first_infer = _DownStack(c.first_deterministic_filters, 4,
                                      c.use_gdn, c.use_sig_convs,
                                      name="first_infer_block")
        self.first_gen = _UpStack(c.first_deterministic_filters, 4, 3,
                                  c.use_gdn, c.use_sig_convs,
                                  name="first_gen_block")
        self.second_infer = _DownStack(c.second_deterministic_filters, 2,
                                       False, c.use_sig_convs, lead_3x3=True,
                                       name="second_infer_block")
        self.second_gen = _UpStack(c.second_deterministic_filters, 2,
                                   c.first_deterministic_filters, False,
                                   c.use_sig_convs, tail_3x3=True,
                                   name="second_gen_block")
        self.infer_block_1 = InferBlock(cfg=block_cfg_1, name="infer_block_1")
        self.infer_block_2 = InferBlock(cfg=block_cfg_2, name="infer_block_2")
        self.gen_block_1 = GenBlock(cfg=block_cfg_1, coder=self.coder,
                                    name="gen_block_1")
        self.gen_block_2 = GenBlock(cfg=block_cfg_2, coder=self.coder,
                                    name="gen_block_2")
        self.generative_base = self.param(
            "generative_base", nn.initializers.normal(0.1),
            (c.second_deterministic_filters,))
        # Init matters: Adam moves a scalar ~lr per step, so starting the
        # log-scale ~3.5 nats from its optimum costs >10k steps of a
        # near-flat likelihood before the model sees any reconstruction
        # gradient (log_scale 0 = scale 1.0 = flat over [-0.5, 0.5] for
        # discretized_logistic).
        self.likelihood_log_scale = self.param(
            "likelihood_log_scale",
            nn.initializers.constant(c.likelihood_log_scale_init), ())

    # -- likelihood (large-model family, ref :396-433) --------------------

    def _log_likelihood(self, reference, reconstruction):
        c = self.cfg
        # Floor at half a quantization bin: a logistic sharper than the
        # 1/256 bin makes every off-by-one-bin residual's probability
        # underflow (log(1e-7) walls with zero gradient, NaN at the edge).
        scale = lower_bound(jnp.exp(self.likelihood_log_scale),
                            1.0 / 512.0)
        num_dims = float(reference.shape[1] * reference.shape[2]
                         * reference.shape[3])

        def laplace(blur=False):
            # TRUE Laplace log-density over 255-scaled pixels, b = scale:
            # sum -|255 dx|/b - log(2b).  The normalizer term is load-
            # bearing: without it the objective is monotonically decreasing
            # in the learned scale, so training pushes log_scale to +inf,
            # the reconstruction term vanishes, and the model silently
            # collapses (observed: log_scale 4.19 after 23k iters, PSNR
            # stuck at ~27 dB).
            lp = jnp.abs(reconstruction - reference) / scale
            if blur:
                lp = gaussian_blur(lp, kernel_size=11, sigma=8.0)
            return (-jnp.sum(lp, axis=(1, 2, 3)) * 255.0
                    - num_dims * jnp.log(2.0 * scale))

        def msssim_ll():
            v = ms_ssim(reference + 0.5, reconstruction + 0.5, max_val=1.0,
                        weights=(1.0, 1.0, 1.0, 1.0, 1.0))
            return (v - 1.0) * num_dims * 255.0

        if c.likelihood == "discretized_logistic":
            from .likelihoods import discretized_logistic

            recon = jnp.clip(reconstruction, -0.5 + 1 / 512., 0.5 - 1 / 512.)
            return discretized_logistic(reference, recon, scale)
        if c.likelihood == "gaussian":
            # TRUE Gaussian log-density over 255-scaled pixels with
            # variance = scale (same runaway-normalizer note as laplace).
            return (-0.5 * jnp.sum(
                jnp.square(reference - reconstruction) / scale,
                axis=(1, 2, 3)) * 255.0 ** 2
                - 0.5 * num_dims * jnp.log(2.0 * jnp.pi * scale))
        if c.likelihood == "laplace":
            return laplace()
        if c.likelihood == "ms-ssim":
            return msssim_ll()
        if c.likelihood == "ms-ssim-laplace":
            alpha = 0.84
            return alpha * msssim_ll() + (1 - alpha) * laplace(blur=True)
        raise ValueError(c.likelihood)

    # -- passes -----------------------------------------------------------

    def _base(self, batch, height, width):
        return jnp.broadcast_to(
            self.generative_base,
            (batch, height // 64, width // 64,
             self.cfg.second_deterministic_filters))

    def _infer(self, images):
        t = self.first_infer(images)
        t, stats1 = self.infer_block_1(t, None)
        t = self.second_infer(t)
        _, stats2 = self.infer_block_2(t, None)
        return stats1, stats2

    def _generate(self, base, mode, xs1, xs2):
        t, out2 = self.gen_block_2(base, mode, xs2)
        t = self.second_gen(t)
        t, out1 = self.gen_block_1(t, mode, xs1)
        t = self.first_gen(t)
        recon = jnp.clip(t, -0.5 + 1.0 / 512.0, 0.5 - 1.0 / 512.0)
        return recon, out1, out2

    def __call__(self, images, key):
        B, H, W, _ = images.shape
        stats1, stats2 = self._infer(images)
        k1, k2 = jax.random.split(key)
        recon, out1, out2 = self._generate(
            self._base(B, H, W), "train",
            dict(stats1, key=k1), dict(stats2, key=k2))
        log_lik = self._log_likelihood(images, recon)
        return {
            "reconstruction": recon + 0.5,
            "log_likelihood": log_lik,
            # Same array layouts as BidirectionalResNetVAE so the shared
            # lossless trainer's free-bits path works unchanged: channels of
            # both blocks concatenated, per-block KLs stacked.
            "kld_channelwise": jnp.concatenate(
                [out1["kld_channelwise"], out2["kld_channelwise"]]),
            "analytic_kl": jnp.stack([out1["analytic_kl"],
                                      out2["analytic_kl"]]),
            "empirical_kld": jnp.stack([out1["empirical_kld"],
                                        out2["empirical_kld"]]),
            # Per-group (posterior, prior) pairs in TOP-DOWN (transmission)
            # order — block 2 then block 1, matching compress's latents
            # list — for coder initialization (ref :557-583 initializes per
            # stochastic block).  A tuple, not a stack: the two groups have
            # different spatial shapes.
            "posterior_prior_pairs": (
                (out2["posterior"], out2["prior"]),
                (out1["posterior"], out1["prior"])),
        }

    def compress(self, image, seed):
        B, H, W, _ = image.shape
        assert B == 1, "compress expects batch size 1"
        stats1, stats2 = self._infer(image)
        recon, out1, out2 = self._generate(
            self._base(B, H, W), "encode",
            dict(stats1, seed=seed), dict(stats2, seed=seed + 7919))
        return {
            "reconstruction": recon + 0.5,
            # Top-down transmission order: block 2 (top) then block 1.
            "latents": [(out2["indices"], out2["counts"]),
                        (out1["indices"], out1["counts"])],
            "kl": jnp.stack([out2["kl"], out1["kl"]]),
        }

    def decompress(self, shape, latents, seed):
        H, W = shape
        (ind2, cnt2), (ind1, cnt1) = latents
        recon, _, _ = self._generate(
            self._base(1, H, W), "decode",
            {"indices": ind1, "counts": cnt1, "seed": seed},
            {"indices": ind2, "counts": cnt2, "seed": seed + 7919})
        return recon + 0.5
