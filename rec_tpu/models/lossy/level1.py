"""One-level lossy VAE — Ballé factorized-prior analog with a learned
spatially-constant empirical prior (ref rec/models/lossy/large_1_level_vae.py).
Latents at H/16 (9x9/s4 + 5x5/s2 analysis + 5x5/s2 heads)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...coding.gauss import GaussianParams, kl_divergence
from .transforms import softplus_scale as _softplus_scale
from .transforms import (AnalysisTransform, EmpiricalPrior,
                         SynthesisTransform)


class Large1LevelVAE(nn.Module):
    num_filters: int = 196
    coder: Any = None

    def setup(self):
        self.analysis = AnalysisTransform(
            self.num_filters, stages=((9, 4), (5, 2)),
            head_kernel=5, head_stride=2, head_bias=False)
        self.synthesis = SynthesisTransform(
            self.num_filters, stages=((5, 2), (5, 2)),
            final_kernel=9, final_stride=4)
        self.prior = EmpiricalPrior(self.num_filters)

    def _dists(self, images, batch, height, width):
        loc, log_scale = self.analysis(images)
        post = GaussianParams(loc, _softplus_scale(log_scale))
        p_loc, p_log_scale = self.prior(batch, height // 16, width // 16)
        prior = GaussianParams(p_loc, _softplus_scale(p_log_scale))
        return post, prior

    def __call__(self, images, key):
        B, H, W, _ = images.shape
        post, prior = self._dists(images, B, H, W)
        z = post.sample(key)
        recon = self.synthesis(z)
        kls = [jnp.mean(jnp.sum(kl_divergence(post, prior), axis=(1, 2, 3)))]
        return {"reconstruction": recon, "kls": kls, "latents": [z]}

    def rec_forward(self, images, seed):
        B, H, W, _ = images.shape
        assert B == 1, "rec_forward expects batch size 1"
        post, prior = self._dists(images, B, H, W)
        post1 = GaussianParams(post.loc[0], post.scale[0])
        prior1 = GaussianParams(prior.loc[0], prior.scale[0])
        coded = self.coder.encode(post1, prior1, seed)
        recon = self.synthesis(coded.sample[None])
        return {"reconstruction": recon,
                "latents": [(coded.indices, coded.counts)],
                "kls": [jnp.sum(kl_divergence(post1, prior1))]}

    def rec_decode(self, shape, latents, seed):
        H, W = shape
        p_loc, p_log_scale = self.prior(1, H // 16, W // 16)
        prior1 = GaussianParams(p_loc[0], _softplus_scale(p_log_scale)[0])
        (ind, cnt), = latents
        z = self.coder.decode(prior1, ind, cnt, seed)[None]
        return self.synthesis(z)
