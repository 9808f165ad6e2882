"""Auxiliary-variance-ratio fitting (coder initialization).

The default coder path extrapolates ratios by power law; this module is the
optimized alternative (ref rec/coding/coder.py:233-410, driven by
``compression_performance.py mode=initialize``): for each ratio index r from
max partitions down to 2, SGD a sigmoid-reparameterized variance ratio so
that the auxiliary KL hits Omega (hinge losses on aux-KL > Omega and
remaining-KL > Omega*(r-1)), then condition the distributions on a sampled
auxiliary variable and recurse.  Running averages accumulate across batches.

TPU re-design: the per-ratio SGD loop is one jitted ``lax.while_loop`` (all
selected blocks optimized simultaneously instead of the reference's
tqdm-driven eager loop); the outer loop over ratio indices stays in Python
(it is sequential by construction and ~max_partitions short).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gauss import (GaussianParams, auxiliary_coder, auxiliary_target,
                    conditional_coder, conditional_target, kl_divergence)


def sigmoid_inverse(x):
    x = jnp.clip(x, 1e-10, 1.0 - 1e-10)
    return jnp.log(x) - jnp.log1p(-x)


@dataclasses.dataclass(frozen=True)
class RatioFitConfig:
    kl_per_partition: float = 3.0
    learning_rate: float = 1e-3
    max_iters: int = 10_000
    relative_tolerance: float = 1e-4


@partial(jax.jit, static_argnums=(0,))
def _fit_one_ratio(cfg: RatioFitConfig, target: GaussianParams,
                   coder: GaussianParams, mask, ratio_index, init_ratio, key):
    """SGD the scalar ratio for partition count ``ratio_index`` over all
    masked blocks at once.  Returns (ratio, conditioned target, conditioned
    coder)."""
    omega = cfg.kl_per_partition

    def losses(theta):
        ratio = jax.nn.sigmoid(theta)
        aux_var = ratio * coder.var
        aux_t = auxiliary_target(target, coder, aux_var)
        aux_c = auxiliary_coder(coder, aux_var)
        aux_kl = jnp.sum(kl_divergence(aux_t, aux_c), axis=-1)
        total_kl = jnp.sum(kl_divergence(target, coder), axis=-1)
        r = ratio_index.astype(jnp.float32)
        aux_loss = jnp.where(aux_kl > omega, jnp.square(aux_kl - omega), 0.0)
        rem = total_kl - aux_kl
        rem_loss = jnp.where(rem > omega * (r - 1.0),
                             jnp.square(rem - omega * (r - 1.0)), 0.0)
        # Mean over the SELECTED blocks only (the reference gathers them,
        # coder.py:314-318); averaging over all blocks would shrink the
        # gradient and trip the absolute early-stop when few blocks match.
        n_sel = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(mask, aux_loss + rem_loss, 0.0)) / n_sel

    grad_fn = jax.value_and_grad(losses)

    def cond(carry):
        i, theta, prev_loss, loss = carry
        return (i < cfg.max_iters) & (jnp.abs(prev_loss - loss)
                                      >= cfg.relative_tolerance)

    def body(carry):
        i, theta, _, loss = carry
        new_loss, g = grad_fn(theta)
        return i + 1, theta - cfg.learning_rate * g, loss, new_loss

    theta0 = sigmoid_inverse(init_ratio)
    l0, g0 = grad_fn(theta0)
    _, theta, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1), theta0 - cfg.learning_rate * g0,
                     jnp.asarray(jnp.inf), l0))
    ratio = jax.nn.sigmoid(theta)

    # Condition on a sampled auxiliary variable (ref coder.py:392-401).
    aux_var = ratio * coder.var
    aux_t = auxiliary_target(target, coder, aux_var)
    aux_sample = aux_t.sample(key)
    new_target = conditional_target(target, coder, aux_var, aux_sample)
    new_coder = conditional_coder(coder, aux_var, aux_sample)
    # Only conditioned where the mask selects the block.
    keep = mask[:, None]
    new_target = GaussianParams(jnp.where(keep, new_target.loc, target.loc),
                                jnp.where(keep, new_target.scale,
                                          target.scale))
    new_coder = GaussianParams(jnp.where(keep, new_coder.loc, coder.loc),
                               jnp.where(keep, new_coder.scale, coder.scale))
    return ratio, new_target, new_coder


class RatioFitter:
    """Accumulates fitted ratios across batches (running average, ref
    coder.py:385-389)."""

    def __init__(self, cfg: Optional[RatioFitConfig] = None,
                 max_partitions: int = 32):
        self.cfg = cfg or RatioFitConfig()
        self.ratios = np.zeros(max_partitions)
        self.counts = np.zeros(max_partitions)
        self.ratios[0] = 1.0
        self.counts[0] = 1.0

    def update(self, target: GaussianParams, coder: GaussianParams, key):
        """``target``/``coder``: stacked blocks (num_blocks, D)."""
        total_kl = jnp.sum(kl_divergence(target, coder), axis=-1)
        n_aux = 1 + jnp.floor(total_kl / self.cfg.kl_per_partition
                              ).astype(jnp.int32)
        max_n = min(int(jnp.max(n_aux)), len(self.ratios))

        for r in range(max_n, 1, -1):
            mask = n_aux >= r
            n_sel = int(jnp.sum(mask))
            if n_sel == 0:
                continue
            if self.counts[r - 1] > 0 and self.ratios[r - 1] > 0:
                init = self.ratios[r - 1]
            elif r < max_n and self.ratios[r] > 0:
                init = self.ratios[r]
            else:
                init = 1.0 / r
            key, sub = jax.random.split(key)
            ratio, target, coder = _fit_one_ratio(
                self.cfg, target, coder, mask, jnp.asarray(r, jnp.float32),
                jnp.asarray(init, jnp.float32), sub)
            ratio = float(ratio)
            self.ratios[r - 1] = ((self.ratios[r - 1] * self.counts[r - 1]
                                   + ratio * n_sel)
                                  / (self.counts[r - 1] + n_sel))
            self.counts[r - 1] += n_sel

    def fitted(self) -> Tuple[float, ...]:
        """Ratio table usable as ``aux_variance_ratios`` on a coder; unfitted
        entries fall back to the power law."""
        from .partition import aux_variance_ratio

        out = []
        for i, (r, c) in enumerate(zip(self.ratios, self.counts)):
            out.append(r if c > 0 and r > 0
                       else float(aux_variance_ratio(i)))
        return tuple(out)
