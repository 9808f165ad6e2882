"""Two-level lossy VAE — the paper's lossy model (Ballé hyperprior analog,
ref rec/models/lossy/large_2_level_vae.py:255-456).

Level 1 latents at H/16 with level_1_filters channels; level 2 (hyper)
latents at H/64.  The level-1 posterior combines analysis stats with the
hyper-synthesized prior stats through elu + 1x1-conv combiners (ref
:371-387).  REC coding codes z2 (against the learned empirical prior) then
z1 (against the hyper-synthesized prior)."""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...coding.gauss import GaussianParams, kl_divergence
from .transforms import softplus_scale as _softplus_scale
from .transforms import (AnalysisTransform, EmpiricalPrior,
                         HyperAnalysisTransform, HyperSynthesisTransform,
                         SynthesisTransform)


class Large2LevelVAE(nn.Module):
    level_1_filters: int = 196
    level_2_filters: int = 128
    coder: Any = None  # REC coder (static dataclass); None = training only

    def setup(self):
        self.analysis = AnalysisTransform(self.level_1_filters,
                                          stages=((5, 2),) * 3)
        self.synthesis = SynthesisTransform(self.level_1_filters,
                                            stages=((5, 2),) * 3)
        self.hyper_analysis = HyperAnalysisTransform(self.level_2_filters)
        self.hyper_synthesis = HyperSynthesisTransform(
            self.level_2_filters, num_output_filters=self.level_1_filters)
        self.level_2_prior = EmpiricalPrior(self.level_2_filters)
        self.loc_combiner = nn.Conv(self.level_1_filters, (1, 1),
                                    name="level_1_posterior_loc_combiner")
        self.log_scale_combiner = nn.Conv(
            self.level_1_filters, (1, 1),
            name="level_1_posterior_log_scale_combiner")

    # -- pieces -----------------------------------------------------------

    def _level2_posterior(self, images):
        l1_loc, l1_log_scale = self.analysis(images)
        l2_loc, l2_log_scale = self.hyper_analysis(l1_loc)
        return (GaussianParams(l2_loc, _softplus_scale(l2_log_scale)),
                l1_loc, l1_log_scale)

    def _level2_prior(self, batch, height, width):
        loc, log_scale = self.level_2_prior(batch, height // 64, width // 64)
        return GaussianParams(loc, _softplus_scale(log_scale))

    def _level1_dists(self, z2, l1_loc, l1_log_scale):
        p_loc, p_log_scale = self.hyper_synthesis(z2)
        prior = GaussianParams(p_loc, _softplus_scale(p_log_scale))
        loc = jax.nn.elu(jnp.concatenate([l1_loc, p_loc], axis=-1))
        log_scale = jax.nn.elu(
            jnp.concatenate([l1_log_scale, p_log_scale], axis=-1))
        post = GaussianParams(
            self.loc_combiner(loc),
            _softplus_scale(self.log_scale_combiner(log_scale)))
        return post, prior

    # -- training forward -------------------------------------------------

    def __call__(self, images, key):
        B, H, W, _ = images.shape
        k2, k1 = jax.random.split(key)
        l2_post, l1_loc, l1_log_scale = self._level2_posterior(images)
        l2_prior = self._level2_prior(B, H, W)
        z2 = l2_post.sample(k2)
        l1_post, l1_prior = self._level1_dists(z2, l1_loc, l1_log_scale)
        z1 = l1_post.sample(k1)
        recon = self.synthesis(z1)
        kls = [jnp.mean(jnp.sum(kl_divergence(l2_post, l2_prior),
                                axis=(1, 2, 3))),
               jnp.mean(jnp.sum(kl_divergence(l1_post, l1_prior),
                                axis=(1, 2, 3)))]
        return {"reconstruction": recon, "kls": kls,
                "latents": [z2, z1]}

    # -- REC compression --------------------------------------------------

    def rec_forward(self, images, seed):
        """Code z2 then z1 with the external coder (ref :320-404)."""
        B, H, W, _ = images.shape
        assert B == 1, "rec_forward expects batch size 1"
        l2_post, l1_loc, l1_log_scale = self._level2_posterior(images)
        l2_prior = self._level2_prior(B, H, W)
        l2_post1 = GaussianParams(l2_post.loc[0], l2_post.scale[0])
        l2_prior1 = GaussianParams(l2_prior.loc[0], l2_prior.scale[0])
        coded2 = self.coder.encode(l2_post1, l2_prior1, seed)
        z2 = coded2.sample[None]

        l1_post, l1_prior = self._level1_dists(z2, l1_loc, l1_log_scale)
        l1_post1 = GaussianParams(l1_post.loc[0], l1_post.scale[0])
        l1_prior1 = GaussianParams(l1_prior.loc[0], l1_prior.scale[0])
        coded1 = self.coder.encode(l1_post1, l1_prior1, seed + 1)
        z1 = coded1.sample[None]

        recon = self.synthesis(z1)
        return {"reconstruction": recon,
                "latents": [(coded2.indices, coded2.counts),
                            (coded1.indices, coded1.counts)],
                "kls": [jnp.sum(kl_divergence(l2_post1, l2_prior1)),
                        jnp.sum(kl_divergence(l1_post1, l1_prior1))]}

    def rec_decode(self, shape, latents, seed):
        """(ref :421-456)"""
        H, W = shape
        l2_prior = self._level2_prior(1, H, W)
        l2_prior1 = GaussianParams(l2_prior.loc[0], l2_prior.scale[0])
        (ind2, cnt2), (ind1, cnt1) = latents
        z2 = self.coder.decode(l2_prior1, ind2, cnt2, seed)[None]
        p_loc, p_log_scale = self.hyper_synthesis(z2)
        l1_prior1 = GaussianParams(p_loc[0],
                                   _softplus_scale(p_log_scale)[0])
        z1 = self.coder.decode(l1_prior1, ind1, cnt1, seed + 1)[None]
        return self.synthesis(z1)
