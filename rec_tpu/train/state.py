"""Train state: params + optimizer + EMA shadow params + controller state.

Mirrors the reference checkpoint contents (step, model, optimizer, learning
rate, beta — ref train_generative_model.py:364-370) as one pytree, with the
EMA shadow variables (ref resnet_vae.py:747-789) carried functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    beta: jnp.ndarray


def staircase_schedule(base_lr: float, drop_after: int, drop_rate: float,
                       num_drops: int = 4) -> Callable:
    """LR drops by ``drop_rate`` at k, 2k, 3k, 4k iters (ref
    train_generative_model.py:439-449)."""

    def schedule(step):
        n = jnp.clip(step // drop_after, 0, num_drops)
        return base_lr * (drop_rate ** n)

    return schedule


def make_optimizer(name: str, schedule,
                   clip_norm: float = 0.0) -> optax.GradientTransformation:
    """adam/adamax with optional global-norm gradient clipping.

    Clipping matters once a REAL (normalized) likelihood is trained: a
    sharp discretized-logistic at a learned scale produces occasional
    huge recon gradients (observed: NaN at ~1k iters training the large
    model at lr 3e-4), which the flat pseudo-likelihoods never did.
    ``clip_norm=0`` preserves the old optimizer exactly (checkpointed
    opt_state trees stay compatible only within one setting)."""
    table = {"adam": optax.adam, "adamax": optax.adamax}
    opt = table[name](schedule)
    if clip_norm and clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt


def init_state(params, tx: optax.GradientTransformation,
               beta: float) -> TrainState:
    # EMA shadow params must be distinct buffers: the jitted train step
    # donates the whole state, and donating the same buffer twice (params
    # aliasing ema_params) is an XLA error.
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=params,
                      opt_state=tx.init(params),
                      ema_params=jax.tree_util.tree_map(jnp.copy, params),
                      beta=jnp.asarray(beta, jnp.float32))


def ema_update(ema_params, params, decay: float):
    """shadow -= (1 - decay) * (shadow - value) (ref resnet_vae.py:764-772)."""
    return jax.tree_util.tree_map(
        lambda e, p: e - (1.0 - decay) * (e - p), ema_params, params)
