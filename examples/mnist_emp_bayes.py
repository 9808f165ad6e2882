"""MNIST empirical-Bayes VAE training
(parity: ref examples/mnist_emp_bayes.py).

Trains a dense MNIST VAE with one of {gaussian, mog, vamp, snis} priors and
a soft-max-KL regularizer (ref :159-165); tolerates transient NaN steps
(ref :170-179).

Usage: python examples/mnist_emp_bayes.py --prior vamp --iters 5000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rec_tpu.data.datasets import DatasetConfig, iterate_batches
from rec_tpu.models.mnist_vae import (MNISTMoGVAE, MNISTSNISVAE, MNISTVAE,
                                      MNISTVampVAE)
from rec_tpu.utils.logging import setup_logger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prior", choices=["gaussian", "mog", "vamp", "snis"],
                    default="gaussian")
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--latents", type=int, default=50)
    ap.add_argument("--hidden", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-kl", type=float, default=None,
                    help="soft max-KL regularizer target (nats)")
    ap.add_argument("--save-dir", type=str, default="checkpoints/mnist")
    args = ap.parse_args()
    log = setup_logger("mnist_emp_bayes")

    if args.prior == "vamp":
        model = MNISTVampVAE(latents=args.latents, hidden_size=args.hidden)
    elif args.prior == "mog":
        model = MNISTMoGVAE(latents=args.latents, hidden_size=args.hidden)
    elif args.prior == "snis":
        model = MNISTSNISVAE(latents=args.latents, hidden_size=args.hidden)
    else:
        model = MNISTVAE(latents=args.latents, hidden_size=args.hidden)

    batches = iterate_batches(
        DatasetConfig(dataset="binarized_mnist", normalize="unit"),
        args.batch)
    first = jnp.asarray(next(batches))

    needs_snis_rng = args.prior == "snis"
    key = jax.random.PRNGKey(0)
    init_rngs = {"params": key}
    if needs_snis_rng:
        init_rngs["snis"] = jax.random.PRNGKey(2)
    params = model.init(init_rngs, first, jax.random.PRNGKey(1))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            rngs = (
                {"snis": jax.random.fold_in(key, 1)} if needs_snis_rng
                else None)
            out = model.apply(p, batch, key, rngs=rngs)
            elbo = jnp.mean(out["log_likelihood"] - out["kl"])
            loss = -elbo
            if args.max_kl is not None:
                # Soft max-KL (ref mnist_emp_bayes.py:159-165).
                loss = loss + jnp.maximum(
                    jnp.mean(out["kl"]) - args.max_kl, 0.0)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, out

    nan_steps = 0
    for i in range(args.iters):
        key, ks = jax.random.split(key)
        batch = jnp.asarray(next(batches))
        new_params, new_opt, loss, out = step(params, opt_state, batch, ks)
        if not np.isfinite(float(loss)):
            nan_steps += 1  # tolerate up to 50 NaN steps (ref :170-179)
            if nan_steps > 50:
                log.error("too many NaN steps; aborting")
                break
            continue
        params, opt_state = new_params, new_opt
        if i % 500 == 0:
            log.info(f"step {i}: loss={float(loss):.2f} "
                     f"kl={float(jnp.mean(out['kl'])):.2f}")
    log.info(f"done: final loss={float(loss):.2f}, nan steps={nan_steps}")


if __name__ == "__main__":
    main()
