"""Bidirectional ResNet VAE (RVAE) — the lossless flagship model.

Kingma et al. IAF-VAE architecture re-designed for TPU (parity target: ref
rec/models/resnet_vae.py).  Structural translation:

  * the reference's 24 ``BidirectionalResidualBlock`` Keras layers, each
    owning intertwined infer/gen sublayers and a coder, become TWO
    ``nn.scan`` parameter stacks — an inference stack (run bottom-up) and a
    generative stack (run top-down).  Infer-side and gen-side parameters are
    disjoint in the reference too (ref resnet_vae.py:387-457); splitting them
    makes each pass a single fused scan instead of 24 unrolled layers.
  * posterior = N(infer_loc + gen_loc, exp(infer_ls + gen_ls)) — the
    bidirectional-inference sum (ref :148-154).
  * residual update x + 0.1 * f(x) (ref :490, HiLLoC scaling).
  * "h_top" empirical-Bayes generative base (ref :621-633).
  * compression: the SAME generative scan with the per-block REC coder call
    inside the scan body, so model.compress is one jitted program; the
    reference's serial Python loop over res blocks (ref :821-826) disappears.
  * every block (including the edges) has identical structure; the
    reference prunes unused sublayers at the ends (is_last, ref :196) —
    here those parameters exist but are dead, which XLA DCEs.

Latent distributions: gaussian (codable) or cauchy (training only, ref
:27-30).  IAF posteriors supported for training (ref :348-368,436-451).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..coding import BeamSearchCoder, GaussianCoder
from ..coding.gauss import GaussianParams, kl_divergence
from .likelihoods import get_likelihood
from .modules import (AutoRegressiveMultiConv2D, ReparameterizedConv2D,
                      ReparameterizedConv2DTranspose)


@dataclasses.dataclass(frozen=True)
class ResNetVAEConfig:
    num_res_blocks: int = 24
    deterministic_filters: int = 160
    stochastic_filters: int = 32
    kernel_size: Tuple[int, int] = (3, 3)
    first_kernel_size: Tuple[int, int] = (5, 5)
    first_strides: Tuple[int, int] = (2, 2)
    likelihood: str = "discretized_logistic"
    learn_likelihood_scale: bool = True
    distribution: str = "gaussian"  # "gaussian" | "cauchy"
    use_iaf: bool = False
    output_channels: int = 3


def _conv(features, kernel, name):
    return ReparameterizedConv2D(features=features, kernel_size=kernel,
                                 name=name)


def _bounded_exp(log_scale):
    """Scale head: exp with the log-scale clipped to ±12.

    In-distribution log-scales live within a few nats of 0, so trained
    behavior is bit-unchanged; the clip only engages on far-off-distribution
    inputs, where an unguarded exp underflows to 0 (KL → inf) and a single
    probe image can demand a multi-million-partition coding budget
    (observed: pygame's empty-room webcam photo through the photos384
    corpus model — required_partitions returned 8.9e6 on TPU).  exp(-12) ≈
    6e-6 keeps every KL term finite while being far below any scale a
    trained head emits."""
    return jnp.exp(jnp.clip(log_scale, -12.0, 12.0))


class InferBlock(nn.Module):
    """One inference-pass block: posterior head stats + residual features
    (ref resnet_vae.py:387-401)."""

    cfg: ResNetVAEConfig

    @nn.compact
    def __call__(self, carry, _):
        cfg = self.cfg
        x = carry
        h = jax.nn.elu(x)
        loc = _conv(cfg.stochastic_filters, cfg.kernel_size,
                    "infer_posterior_loc_head")(h)
        log_scale = _conv(cfg.stochastic_filters, cfg.kernel_size,
                          "infer_posterior_log_scale_head")(h)
        outs = {"infer_loc": loc, "infer_log_scale": log_scale}
        if cfg.use_iaf:
            outs["iaf_context"] = _conv(cfg.deterministic_filters,
                                        cfg.kernel_size,
                                        "infer_iaf_context")(h)
        t = _conv(cfg.deterministic_filters, cfg.kernel_size, "infer_conv_0")(h)
        t = jax.nn.elu(t)
        t = _conv(cfg.deterministic_filters, cfg.kernel_size, "infer_conv_1")(t)
        return x + 0.1 * t, outs


class GenBlock(nn.Module):
    """One generative-pass block.  ``mode`` is static:
      * "train": sample posterior, output empirical + analytic KL
      * "encode": REC-encode posterior against prior with the block coder
      * "decode": REC-decode the latent from transmitted indices
    (ref resnet_vae.py:406-490 — the three encoder_args/decoder_args paths).
    """

    cfg: ResNetVAEConfig
    coder: Any = None  # BeamSearchCoder | GaussianCoder (static dataclass)

    @nn.compact
    def __call__(self, carry, mode, xs):
        # ``mode`` is a broadcast (static) scan argument — see the
        # nn.scan(in_axes=(nn.broadcast, 0)) wiring in the parent.
        cfg = self.cfg
        x = carry
        h = jax.nn.elu(x)

        prior_loc = _conv(cfg.stochastic_filters, cfg.kernel_size,
                          "prior_loc_head")(h)
        prior_log_scale = _conv(cfg.stochastic_filters, cfg.kernel_size,
                                "prior_log_scale_head")(h)
        prior = GaussianParams(prior_loc, _bounded_exp(prior_log_scale))

        outs = {}
        if mode in ("train", "encode"):
            gen_loc = _conv(cfg.stochastic_filters, cfg.kernel_size,
                            "gen_posterior_loc_head")(h)
            gen_log_scale = _conv(cfg.stochastic_filters, cfg.kernel_size,
                                  "gen_posterior_log_scale_head")(h)
            post = GaussianParams(
                xs["infer_loc"] + gen_loc,
                _bounded_exp(xs["infer_log_scale"] + gen_log_scale))

        if mode == "train":
            if cfg.distribution == "cauchy":
                u = jax.random.uniform(xs["key"], post.loc.shape,
                                       minval=1e-6, maxval=1.0 - 1e-6)
                z = post.loc + post.scale * jnp.tan(jnp.pi * (u - 0.5))
                post_lp = _cauchy_log_prob(z, post)
                prior_lp = _cauchy_log_prob(z, prior)
            else:
                z = post.loc + post.scale * jax.random.normal(
                    xs["key"], post.loc.shape)
                post_lp = post.log_prob(z)
                prior_lp = None  # filled after optional IAF below

            if cfg.use_iaf and cfg.distribution == "gaussian":
                gen_ctx = _conv(cfg.deterministic_filters, cfg.kernel_size,
                                "gen_iaf_context")(h)
                context = xs["iaf_context"] + gen_ctx
                iaf_mean, iaf_log_scale = AutoRegressiveMultiConv2D(
                    convolution_features=[cfg.deterministic_filters] * 2,
                    head_features=[cfg.stochastic_filters] * 2,
                    name="iaf_posterior_multiconv")(z, context)
                iaf_mean = 0.1 * iaf_mean
                iaf_log_scale = 0.1 * iaf_log_scale
                z = (z - iaf_mean) / jnp.exp(iaf_log_scale)
                post_lp = post_lp + iaf_log_scale
            if prior_lp is None:
                prior_lp = prior.log_prob(z)

            empirical_kld = post_lp - prior_lp
            # Per-channel KL for the free-bits constraint: sum over H,W,
            # mean over batch (ref resnet_vae.py:163-191).
            if cfg.distribution == "gaussian" and not cfg.use_iaf:
                kld_elem = kl_divergence(post, prior)
            else:
                kld_elem = empirical_kld
            outs["kld_channelwise"] = jnp.mean(
                jnp.sum(kld_elem, axis=(1, 2)), axis=0)
            outs["empirical_kld"] = jnp.sum(empirical_kld,
                                            axis=(1, 2, 3))
            outs["analytic_kl"] = (
                jnp.sum(kl_divergence(post, prior), axis=(1, 2, 3))
                if cfg.distribution == "gaussian" and not cfg.use_iaf
                else outs["empirical_kld"])
            outs["posterior"] = post
            outs["prior"] = prior

        elif mode == "encode":
            # Batch size 1: squeeze the batch axis for the coder (the
            # reference has the same restriction, ref coder.py:494-495).
            post1 = GaussianParams(post.loc[0], post.scale[0])
            prior1 = GaussianParams(prior.loc[0], prior.scale[0])
            coded = self.coder.encode(post1, prior1, xs["seed"])
            z = coded.sample[None]
            outs["indices"] = coded.indices
            outs["counts"] = coded.counts
            outs["kl"] = jnp.sum(kl_divergence(post1, prior1))

        elif mode == "decode":
            prior1 = GaussianParams(prior.loc[0], prior.scale[0])
            z = self.coder.decode(prior1, xs["indices"], xs["counts"],
                                  xs["seed"])[None]
        else:
            raise ValueError(mode)

        t = _conv(cfg.deterministic_filters, cfg.kernel_size, "gen_conv_0")(h)
        t = jnp.concatenate([t, z], axis=-1)
        t = jax.nn.elu(t)
        t = _conv(cfg.deterministic_filters, cfg.kernel_size, "gen_conv_1")(t)
        return x + 0.1 * t, outs


def _cauchy_log_prob(z, d: GaussianParams):
    x = (z - d.loc) / d.scale
    return -jnp.log(jnp.pi * d.scale * (1.0 + jnp.square(x)))


class BidirectionalResNetVAE(nn.Module):
    """The full RVAE (ref resnet_vae.py:512-860)."""

    cfg: ResNetVAEConfig = ResNetVAEConfig()
    coder: Any = None  # coder shared by all blocks (static dataclass)

    def setup(self):
        cfg = self.cfg
        self.first_infer_conv = ReparameterizedConv2D(
            features=cfg.deterministic_filters,
            kernel_size=cfg.first_kernel_size,
            strides=cfg.first_strides, name="first_infer_conv")
        self.last_gen_conv = ReparameterizedConv2DTranspose(
            features=cfg.output_channels,
            kernel_size=cfg.first_kernel_size,
            strides=cfg.first_strides, name="last_gen_conv")
        scan_kwargs = dict(
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_res_blocks)
        self.infer_stack = nn.scan(InferBlock, in_axes=0, out_axes=0,
                                   **scan_kwargs)(cfg=cfg, name="infer_stack")
        self.gen_stack = nn.scan(GenBlock, in_axes=(nn.broadcast, 0),
                                 out_axes=0,
                                 **scan_kwargs)(cfg=cfg, coder=self.coder,
                                                name="gen_stack")
        # "h_top": empirical-Bayes top prior (ref resnet_vae.py:621-633).
        # Deviation from the reference's zeros init: a small random base
        # gives the generative-side convs non-degenerate statistics for
        # their data-dependent init (an all-zero base makes every gen conv
        # see exactly-zero input on the init pass).
        self.generative_base = self.param(
            "generative_base", nn.initializers.normal(0.1),
            (cfg.deterministic_filters,))
        self.likelihood_log_scale = self.param(
            "likelihood_log_scale", nn.initializers.zeros, ())

    def _base(self, batch, height, width):
        sh, sw = self.cfg.first_strides
        return jnp.broadcast_to(
            self.generative_base,
            (batch, height // sh, width // sw,
             self.cfg.deterministic_filters))

    def _infer(self, images):
        """Bottom-up pass; returns per-block infer stats in GENERATIVE
        (top-down) order, i.e. reversed scan outputs."""
        t = self.first_infer_conv(images)
        _, outs = self.infer_stack(t, jnp.arange(self.cfg.num_res_blocks))
        # The inference scan runs blocks N-1..0 of the generative order, so
        # index 0 of its stacked outputs belongs to generative block N-1.
        return jax.tree_util.tree_map(lambda a: a[::-1], outs)

    def _reconstruct(self, t):
        r = jax.nn.elu(t)
        r = self.last_gen_conv(r)
        return jnp.clip(r, -0.5 + 1.0 / 512.0, 0.5 - 1.0 / 512.0)

    def __call__(self, images, key):
        """Training/eval forward pass.  Images in [-0.5, 0.5], NHWC."""
        cfg = self.cfg
        B, H, W, _ = images.shape
        infer_outs = self._infer(images)
        keys = jax.random.split(key, cfg.num_res_blocks)
        xs = dict(infer_outs, key=keys)
        t, gen_outs = self.gen_stack(self._base(B, H, W), "train", xs)
        reconstruction = self._reconstruct(t)

        scale = jnp.exp(self.likelihood_log_scale)
        if not self.cfg.learn_likelihood_scale:
            scale = jax.lax.stop_gradient(scale)
        log_likelihood = get_likelihood(cfg.likelihood)(
            images, reconstruction, scale)

        return {
            "reconstruction": reconstruction + 0.5,
            "log_likelihood": log_likelihood,                 # (B,)
            "kld_channelwise": gen_outs["kld_channelwise"],   # (N, C)
            "empirical_kld": gen_outs["empirical_kld"],       # (N, B)
            "analytic_kl": gen_outs["analytic_kl"],           # (N, B)
            # Stacked per-block distributions (N, B, H', W', C) — consumed
            # by coder initialization (ref resnet_vae.py:795-801).
            "posterior": gen_outs["posterior"],
            "prior": gen_outs["prior"],
        }

    def compress(self, image, seed):
        """REC-encode one image (batch 1).  Returns per-res-block indices
        (N, num_latent_blocks, P), counts (N, num_latent_blocks), the
        reconstruction, and per-block KLs (ref resnet_vae.py:803-836)."""
        cfg = self.cfg
        B, H, W, _ = image.shape
        assert B == 1, ("compress expects batch size 1 (ref coder.py:494-495);"
                        " use parallel.batch.make_batch_compress for"
                        " multi-image encoding")
        infer_outs = self._infer(image)
        # Distinct coding seed per res block (decoder replicates).
        seeds = seed + 7919 * jnp.arange(cfg.num_res_blocks)
        xs = dict(infer_outs, seed=seeds)
        t, outs = self.gen_stack(self._base(B, H, W), "encode", xs)
        reconstruction = self._reconstruct(t)
        return {
            "indices": outs["indices"],
            "counts": outs["counts"],
            "kl": outs["kl"],
            "reconstruction": reconstruction + 0.5,
        }

    def decompress(self, shape, indices, counts, seed):
        """Regenerate the reconstruction from transmitted (indices, counts,
        seed).  ``shape`` = (H, W); completes the decompress the reference
        left stubbed (ref resnet_vae.py:844-860)."""
        cfg = self.cfg
        H, W = shape
        seeds = seed + 7919 * jnp.arange(cfg.num_res_blocks)
        xs = {"indices": indices, "counts": counts, "seed": seeds}
        t, _ = self.gen_stack(self._base(1, H, W), "decode", xs)
        return self._reconstruct(t) + 0.5
