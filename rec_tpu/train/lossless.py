"""Lossless (RVAE) training: data-parallel jitted train step.

Semantics parity with ref examples/lossless/train_generative_model.py:381-417:
free-bits KL floor (lamb), linear beta anneal, optional target-bpp beta
controller, EMA update per step, staircase LR.  TPU-native: one jit with the
batch sharded over the mesh and params replicated; XLA inserts the gradient
all-reduce.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import TrainState, ema_update

LOG2 = 0.6931471805599453


@dataclasses.dataclass(frozen=True)
class LosslessTrainConfig:
    beta: float = 1.0
    lamb: float = 0.1              # free-bits per-channel floor (nats)
    anneal: bool = False
    annealing_end: int = 100_000
    ema_decay: float = 0.999
    # Optional lossy-target controller (ref :394-399)
    target_bpp: Optional[float] = None
    adjust_beta_after_iters: int = 0


def make_train_step(model, cfg: LosslessTrainConfig, tx: optax.GradientTransformation,
                    num_pixels: int):
    """Returns jitted (state, batch, key) -> (state, metrics)."""

    def loss_fn(params, batch, key):
        out = model.apply(params, batch, key)
        log_lik = jnp.mean(out["log_likelihood"])
        # Free-bits: per-(block, channel) floor then total (ref
        # resnet_vae.py:163-191 + train loop minimum_kl=lamb).
        kld = jnp.sum(jnp.maximum(out["kld_channelwise"], cfg.lamb))
        true_kl = jnp.sum(out["kld_channelwise"])
        return log_lik, kld, true_kl, out

    def step_fn(state: TrainState, batch, key):
        def objective(params):
            log_lik, kld, true_kl, out = loss_fn(params, batch, key)
            bpp = kld / (num_pixels * LOG2)
            # bits per DIM divides by H*W*C (the reference's README bpd
            # convention), unlike bpp which is per pixel.
            num_dims = batch.size // batch.shape[0]
            if cfg.anneal:
                current_beta = state.beta * jnp.minimum(
                    1.0, state.step / cfg.annealing_end)
            else:
                current_beta = state.beta
            loss = -log_lik + current_beta * kld
            # Per-res-block KL scalars + expected max (the reference logs
            # KL/dim_{i+1} per block and Expected_Max_KL each log step,
            # ref train_generative_model.py:275,505-506).
            kl_blocks = jnp.mean(out["analytic_kl"], axis=1)       # (N,)
            aux = {"loss": loss, "nll": -log_lik, "kl": kld,
                   "true_kl": true_kl, "bpp": bpp, "beta": current_beta,
                   "elbo_bpd": (-log_lik + true_kl)
                   / (num_dims * LOG2),
                   "kl_per_block": kl_blocks,
                   "expected_max_kl": jnp.mean(
                       jnp.max(out["analytic_kl"], axis=0)),
                   "reconstruction": out["reconstruction"]}
            return loss, aux

        (loss, metrics), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, cfg.ema_decay)

        beta = state.beta
        if cfg.target_bpp is not None:
            # Multiplicative controller pushing rate to target_bpp
            # (ref train_generative_model.py:394-399).
            active = state.step > cfg.adjust_beta_after_iters
            high = metrics["bpp"] > cfg.target_bpp + 1e-2
            low = metrics["bpp"] < cfg.target_bpp - 1e-2
            factor = jnp.where(high, 1.001, jnp.where(low, 1.0 / 1.001, 1.0))
            beta = jnp.where(active, beta * factor, beta)

        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema,
                               beta=beta)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=0)


def make_vae_train_step(model, cfg: LosslessTrainConfig,
                        tx: optax.GradientTransformation, num_pixels: int):
    """Train step for the dense MNIST VAE (``model=vae`` branch of the
    reference trainer, ref train_generative_model.py:55-68,240-294): no
    free-bits floor (lamb=0 upstream), loss = NLL + beta * mean KL."""

    def step_fn(state: TrainState, batch, key):
        def objective(params):
            out = model.apply(params, batch, key)
            log_lik = jnp.mean(out["log_likelihood"])
            kld = jnp.mean(out["kl"])
            num_dims = batch.size // batch.shape[0]
            if cfg.anneal:
                current_beta = state.beta * jnp.minimum(
                    1.0, state.step / cfg.annealing_end)
            else:
                current_beta = state.beta
            loss = -log_lik + current_beta * kld
            # Expected max per-dim analytic KL vs the N(0,1) prior
            # (ref :275 logs mean-over-batch max-over-dims KL).
            post = out["posterior"]
            kl_dim = 0.5 * (jnp.square(post.scale) + jnp.square(post.loc)
                            - 1.0 - 2.0 * jnp.log(post.scale))
            aux = {"loss": loss, "nll": -log_lik, "kl": kld,
                   "true_kl": kld, "beta": current_beta,
                   "bpp": kld / (num_pixels * LOG2),
                   "elbo_bpd": (-log_lik + kld) / (num_dims * LOG2),
                   "kl_per_block": jnp.mean(kl_dim, axis=0),
                   "expected_max_kl": jnp.mean(jnp.max(kl_dim, axis=-1)),
                   "reconstruction": out["reconstruction"]}
            return loss, aux

        (loss, metrics), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, cfg.ema_decay)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema,
                               beta=state.beta)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=0)


def check_finite(metrics) -> None:
    """NaN blow-up guard (ref train_generative_model.py:455-456)."""
    loss = float(metrics["loss"])
    kl = float(metrics["kl"])
    if not jnp.isfinite(loss) or kl == 0.0:
        raise FloatingPointError(
            f"Loss blew up: loss={loss:.3f}, nll={float(metrics['nll']):.3f},"
            f" kl={kl:.3f}")
