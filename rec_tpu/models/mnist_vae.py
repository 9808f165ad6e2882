"""MNIST dense VAEs (Lawson et al. encoder/decoder) and the VampPrior variant
(ref rec/models/mnist_vae.py), plus flexible prior support for the empirical
Bayes experiments (ref examples/mnist_emp_bayes.py): gaussian / mixture-of-
Gaussians / VampPrior / SNIS priors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..coding.gauss import GaussianParams


class MNISTEncoder(nn.Module):
    """Flatten -> 2x(Dense 300 + tanh) -> (loc, softplus-scale) heads
    (ref mnist_vae.py:12-50)."""

    latents: int = 50
    hidden_size: int = 300

    @nn.compact
    def __call__(self, x):
        h = x.reshape((x.shape[0], -1))
        h = jnp.tanh(nn.Dense(self.hidden_size)(h))
        h = jnp.tanh(nn.Dense(self.hidden_size)(h))
        loc = nn.Dense(self.latents)(h)
        scale = jax.nn.softplus(nn.Dense(self.latents)(h)) + 1e-5
        return GaussianParams(loc, scale)


class MNISTDecoder(nn.Module):
    """2x(Dense 300 + tanh) -> 784 logits -> sigmoid image
    (ref mnist_vae.py:53-76)."""

    hidden_size: int = 300

    @nn.compact
    def __call__(self, z):
        h = jnp.tanh(nn.Dense(self.hidden_size)(z))
        h = jnp.tanh(nn.Dense(self.hidden_size)(h))
        logits = nn.Dense(28 * 28)(h)
        return jax.nn.sigmoid(logits).reshape((-1, 28, 28, 1))


def bernoulli_log_prob(probs, x, eps=1e-10):
    p = jnp.clip(probs, eps, 1.0 - eps)
    lp = x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)
    return jnp.sum(lp, axis=(-3, -2, -1))


class MNISTVAE(nn.Module):
    """Standard-normal-prior dense VAE (ref mnist_vae.py:79-115)."""

    latents: int = 50
    hidden_size: int = 300

    def setup(self):
        self.encoder = MNISTEncoder(self.latents, self.hidden_size)
        self.decoder = MNISTDecoder(self.hidden_size)

    def posterior(self, x) -> GaussianParams:
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, key):
        post = self.encoder(x)
        z = post.sample(key)
        recon = self.decoder(z)
        prior = GaussianParams(jnp.zeros_like(post.loc),
                               jnp.ones_like(post.scale))
        kl = jnp.sum(post.log_prob(z) - prior.log_prob(z), axis=-1)
        log_lik = bernoulli_log_prob(recon, x)
        return {"reconstruction": recon, "kl": kl,
                "log_likelihood": log_lik, "posterior": post, "latent": z}


class MNISTVampVAE(nn.Module):
    """VampPrior VAE: the prior is a uniform mixture of the encoder pushed
    through learned inducing-point pseudo-images (ref mnist_vae.py:118-176)."""

    latents: int = 50
    hidden_size: int = 300
    num_vamp_components: int = 500

    def setup(self):
        self.encoder = MNISTEncoder(self.latents, self.hidden_size)
        self.decoder = MNISTDecoder(self.hidden_size)
        self.inducing_points = self.param(
            "inducing_points",
            lambda key: jax.random.uniform(key,
                                           (self.num_vamp_components,
                                            28, 28, 1)))

    def prior_log_prob(self, z):
        comp = self.encoder(self.inducing_points)       # (K, L)
        # log (1/K) sum_k N(z | comp_k) with diagonal components
        lp = jnp.sum(comp.log_prob(z[:, None, :]), axis=-1)  # (B, K)
        return jax.nn.logsumexp(lp, axis=-1) - jnp.log(
            float(self.num_vamp_components))

    def __call__(self, x, key):
        post = self.encoder(x)
        z = post.sample(key)
        recon = self.decoder(z)
        post_lp = jnp.sum(post.log_prob(z), axis=-1)
        prior_lp = self.prior_log_prob(z)
        kl = post_lp - prior_lp
        log_lik = bernoulli_log_prob(recon, x)
        return {"reconstruction": recon, "kl": kl,
                "log_likelihood": log_lik, "posterior": post, "latent": z}


class MNISTMoGVAE(nn.Module):
    """Mixture-of-Gaussians-prior VAE: the prior is a learned per-dimension
    uniform mixture of ``num_components`` Gaussians
    (ref examples/mnist_emp_bayes.py:63-79 — MixtureSameFamily over a
    (latent_dim, num_components) component grid with probs 1/K)."""

    latents: int = 50
    hidden_size: int = 300
    num_components: int = 100

    def setup(self):
        self.encoder = MNISTEncoder(self.latents, self.hidden_size)
        self.decoder = MNISTDecoder(self.hidden_size)
        # Uniform(-1, 1) init for both loc and log-scale (ref :67-68).
        self.mog_loc = self.param(
            "mog_loc",
            lambda key: jax.random.uniform(
                key, (self.latents, self.num_components),
                minval=-1.0, maxval=1.0))
        self.mog_log_scale = self.param(
            "mog_log_scale",
            lambda key: jax.random.uniform(
                key, (self.latents, self.num_components),
                minval=-1.0, maxval=1.0))

    def prior_log_prob(self, z):
        """Sum over dims of log (1/K) sum_k N(z_d | loc_dk, scale_dk)."""
        scale = jnp.exp(self.mog_log_scale)                      # (L, K)
        zd = z[..., None]                                        # (B, L, 1)
        comp_lp = (-0.5 * jnp.square((zd - self.mog_loc) / scale)
                   - jnp.log(scale) - 0.9189385332046727)        # (B, L, K)
        per_dim = (jax.nn.logsumexp(comp_lp, axis=-1)
                   - jnp.log(float(self.num_components)))        # (B, L)
        return jnp.sum(per_dim, axis=-1)

    def __call__(self, x, key):
        post = self.encoder(x)
        z = post.sample(key)
        recon = self.decoder(z)
        kl = jnp.sum(post.log_prob(z), axis=-1) - self.prior_log_prob(z)
        log_lik = bernoulli_log_prob(recon, x)
        return {"reconstruction": recon, "kl": kl,
                "log_likelihood": log_lik, "posterior": post, "latent": z}


class SNISDistribution(nn.Module):
    """Self-normalized importance-sampling distribution over a standard-normal
    proposal with a learned energy network (ref
    rec/core/modules/snis_distribution.py)."""

    dim: int
    K: int = 128
    hidden: int = 100

    @nn.compact
    def energy(self, x):
        h = jnp.tanh(nn.Dense(self.hidden, name="energy_0")(x))
        h = jnp.tanh(nn.Dense(self.hidden, name="energy_1")(h))
        return nn.Dense(1, name="energy_head")(h)

    def sample(self, key):
        k1, k2 = jax.random.split(key)
        samples = jax.random.normal(k1, (self.K, self.dim))
        weights = self.energy(samples)[:, 0]
        i = jax.random.categorical(k2, weights)
        return samples[i]

    def log_prob_lower_bound(self, x):
        """IWAE-style lower bound on log density (ref
        snis_distribution.py:35-53).  Uses a fixed fold of the module rng."""
        key = self.make_rng("snis")
        x = x.reshape((-1, self.dim))
        samples = jax.random.normal(key, (self.K - 1, self.dim))
        weights = self.energy(samples)[:, 0]                     # (K-1,)
        x_energy = self.energy(x)                                # (B, 1)
        x_pi = jnp.sum(-0.5 * jnp.square(x) - 0.9189385332046727,
                       axis=1, keepdims=True)
        tiled = jnp.broadcast_to(weights[None, :],
                                 (x.shape[0], self.K - 1))
        norm = jax.nn.logsumexp(
            jnp.concatenate([tiled, x_energy], axis=1), axis=1, keepdims=True)
        return x_energy + x_pi + jnp.log(float(self.K)) - norm

    def __call__(self, x):
        return self.log_prob_lower_bound(x)


class MNISTSNISVAE(nn.Module):
    """SNIS-prior VAE: the prior density is the SNIS IWAE-style lower bound
    of a learned energy tilt over a standard-normal proposal
    (ref examples/mnist_emp_bayes.py:86-102).  Requires an "snis" rng stream
    at apply time for the bound's proposal draws."""

    latents: int = 50
    hidden_size: int = 300
    snis_K: int = 1024
    snis_hidden: int = 100

    def setup(self):
        self.encoder = MNISTEncoder(self.latents, self.hidden_size)
        self.decoder = MNISTDecoder(self.hidden_size)
        self.prior = SNISDistribution(dim=self.latents, K=self.snis_K,
                                      hidden=self.snis_hidden)

    def __call__(self, x, key):
        post = self.encoder(x)
        z = post.sample(key)
        recon = self.decoder(z)
        prior_lb = self.prior.log_prob_lower_bound(z)[:, 0]
        kl = jnp.sum(post.log_prob(z), axis=-1) - prior_lb
        log_lik = bernoulli_log_prob(recon, x)
        return {"reconstruction": recon, "kl": kl,
                "log_likelihood": log_lik, "posterior": post, "latent": z}
