"""Lossy VAE training: loss = beta * distortion + bpp
(ref examples/lossy/train_lossy_model.py:139-213).

Distortions: mse / mae / ms-ssim / mae-ms-ssim / discretized_logistic.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..utils.metrics import ms_ssim
from .state import TrainState, ema_update

LOG2 = 0.6931471805599453


def get_distortion(name: str) -> Callable:
    # Per-ELEMENT means with the reference's x255 rescaling corrections
    # (ref train_lossy_model.py:139-173) — NOT per-image sums: the loss is
    # beta * distortion + bpp, and bpp is per pixel, so a per-image-summed
    # distortion would skew the beta scale by the image area (~2e5) and
    # make the published beta values meaningless here.
    def mse(x, y):
        return jnp.mean(jnp.square(x - y)) * 255.0 ** 2

    def mae(x, y):
        return jnp.mean(jnp.abs(x - y)) * 255.0

    def neg_msssim(x, y):
        return jnp.mean(1.0 - ms_ssim(x, y, max_val=1.0)) * 255.0

    def mae_msssim(x, y):
        alpha = 0.84  # ref :166-171 blend
        return alpha * neg_msssim(x, y) + (1 - alpha) * mae(x, y)

    def discretized_logistic(x, y):
        from ..models.likelihoods import discretized_logistic as dl

        return -jnp.mean(dl(x - 0.5, y - 0.5, scale=1.0 / 255.0))

    table = {"mse": mse, "mae": mae, "ms-ssim": neg_msssim,
             "mae-ms-ssim": mae_msssim,
             "discretized_logistic": discretized_logistic}
    return table[name]


@dataclasses.dataclass(frozen=True)
class LossyTrainConfig:
    beta: float = 0.01
    distortion: str = "mse"
    ema_decay: float = 0.999


def make_train_step(model, cfg: LossyTrainConfig,
                    tx: optax.GradientTransformation, num_pixels: int):
    distortion_fn = get_distortion(cfg.distortion)

    def step_fn(state: TrainState, batch, key):
        def objective(params):
            out = model.apply(params, batch, key)
            distortion = distortion_fn(batch, out["reconstruction"])
            rate_bpp = sum(out["kls"]) / (num_pixels * LOG2)
            loss = state.beta * distortion + rate_bpp
            return loss, {"loss": loss, "distortion": distortion,
                          "bpp": rate_bpp}

        (_, metrics), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, cfg.ema_decay)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema,
                          beta=state.beta), metrics

    return jax.jit(step_fn, donate_argnums=0)
