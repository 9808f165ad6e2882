"""Pseudo sample generator: fake a large proposal buffer from few true draws
(ref rec/coding/sample_generator.py:615-666).

``n_true`` true coder samples are recombined per-dimension: each dimension is
assigned to one of ``n_groups`` groups, and pseudo-sample j takes, for every
dimension in group g, the true sample ``assign[g, j]``.  Ratio computation
groups per-dim log-ratios with a one-hot matmul (MXU-friendly) exactly like
the reference's mask trick (sample_generator.py:630-639).

Everything is a pure function of (key, shapes), so encode and decode
regenerate identical buffers — the reference's stateful-seed contract made
explicit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .gauss import GaussianParams, log_density_ratio


@dataclasses.dataclass(frozen=True)
class PseudoSampleGeneratorConfig:
    buffer_size: int = 10000
    n_true_samples: int = 50
    n_groups: int = 50


def _draws(cfg: PseudoSampleGeneratorConfig, coder: GaussianParams, key):
    D = coder.loc.shape[-1]
    k_samp, k_group, k_assign = jax.random.split(key, 3)
    true = coder.sample(k_samp, (cfg.n_true_samples,))       # (T, D)
    groups = jax.random.randint(k_group, (D,), 0, cfg.n_groups)
    assign = jax.random.randint(k_assign, (cfg.n_groups, cfg.buffer_size),
                                0, cfg.n_true_samples)
    return true, groups, assign


def pseudo_ratios(cfg: PseudoSampleGeneratorConfig, target: GaussianParams,
                  coder: GaussianParams, key) -> jnp.ndarray:
    """Log t/p ratios of all pseudo samples, shape (buffer_size,)."""
    true, groups, assign = _draws(cfg, coder, key)
    per_dim = log_density_ratio(true, target, coder)          # (T, D)
    onehot = jax.nn.one_hot(groups, cfg.n_groups, dtype=per_dim.dtype)  # (D, G)
    group_ratios = per_dim @ onehot                           # (T, G)
    # ratio of pseudo-sample j = sum_g group_ratios[assign[g, j], g]
    gathered = jnp.take_along_axis(group_ratios.T, assign, axis=1)  # (G, B)
    return jnp.sum(gathered, axis=0)


def pseudo_sample(cfg: PseudoSampleGeneratorConfig, coder: GaussianParams,
                  key, index) -> jnp.ndarray:
    """Materialize pseudo sample ``index`` (used by both encode and decode)."""
    true, groups, assign = _draws(cfg, coder, key)
    true_idx = assign[groups, index]                          # (D,)
    return jnp.take_along_axis(true.T, true_idx[:, None], axis=1)[:, 0]
