"""SNIS mixture-of-Gaussians toy (parity: ref examples/snis_mog.py).

Trains a self-normalized importance-sampling energy network on a 3x3 MoG and
writes a density-visualization grid.  The CPU-runnable no-trained-model
workload from BASELINE.json.

Usage: python examples/snis_mog.py --iters 2000 --out /tmp/snis
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rec_tpu.models.mnist_vae import SNISDistribution
from rec_tpu.utils.logging import setup_logger

COMPONENT_MEANS = np.array(
    [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 0], [0, 1],
     [1, -1], [1, 0], [1, 1]], np.float32)
COMPONENT_STD = 0.1


def sample_mog(key, n):
    k1, k2 = jax.random.split(key)
    comp = jax.random.randint(k1, (n,), 0, 9)
    eps = jax.random.normal(k2, (n, 2))
    return jnp.asarray(COMPONENT_MEANS)[comp] + COMPONENT_STD * eps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=100)
    ap.add_argument("--K", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", type=str, default="results/snis_mog")
    args = ap.parse_args()
    log = setup_logger("snis_mog")
    os.makedirs(args.out, exist_ok=True)

    model = SNISDistribution(dim=2, K=args.K, hidden=args.hidden)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 2))
    params = model.init({"params": key, "snis": jax.random.PRNGKey(1)}, x0)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            lp = model.apply(p, batch, rngs={"snis": key})
            return -jnp.mean(lp)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.iters):
        key, kd, ks = jax.random.split(key, 3)
        batch = sample_mog(kd, args.batch)
        params, opt_state, loss = step(params, opt_state, batch, ks)
        if i % 200 == 0:
            log.info(f"step {i}: nll={float(loss):.3f}")

    # Density visualization: unnormalized log density on a grid
    # (ref snis_mog.py:127).
    g = np.linspace(-2, 2, 100)
    xx, yy = np.meshgrid(g, g)
    points = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], -1), jnp.float32)
    prior_lp = jnp.sum(-0.5 * points ** 2 - 0.9189385, axis=1, keepdims=True)
    energy = model.apply(params, points, method=model.energy)
    un_log_probs = np.asarray(prior_lp + energy).reshape(100, 100)
    np.save(os.path.join(args.out, "density.npy"), un_log_probs)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imshow(np.exp(un_log_probs - un_log_probs.max()),
                   extent=[-2, 2, -2, 2], origin="lower")
        plt.title("SNIS learned density")
        plt.savefig(os.path.join(args.out, "density.png"), dpi=120)
    except Exception:
        pass
    log.info(f"final nll={float(loss):.3f}; wrote {args.out}/density.npy")

    # ------------------------------------------------------------------
    # SNIS relative entropy coding: transmit a sample from the learned
    # distribution using only the N(0, I) proposal + a shared seed — the
    # BASELINE.json "snis_mog" REC workload.  The custom log-weighting hook
    # scores proposals by the energy network (ref
    # importance_sampling.py:234-238).
    # ------------------------------------------------------------------
    from rec_tpu.coding import GaussianParams
    from rec_tpu.coding.importance import (
        decode_gaussian_importance_sample, encode_gaussian_importance_sample)

    proposal = GaussianParams(jnp.zeros(2), jnp.ones(2))
    energy_fn = lambda eps: model.apply(params, eps, method=model.energy)[:, 0]
    idx, sample = encode_gaussian_importance_sample(
        proposal, proposal, jax.random.PRNGKey(7), coding_bits=10,
        log_weighting_fn=energy_fn)
    recon = decode_gaussian_importance_sample(
        proposal, idx, jax.random.PRNGKey(7), coding_bits=10)
    exact = bool(np.array_equal(np.asarray(sample), np.asarray(recon)))
    log.info(f"SNIS-REC: coded sample {np.asarray(sample).round(3)} with 10 "
             f"bits (index {int(idx)}), bit-exact decode: {exact}")
    assert exact


if __name__ == "__main__":
    main()
