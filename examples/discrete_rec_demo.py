"""Single-partition REC on synthetic distributions — script form of the
reference's prototyping notebooks (ref notebooks/Discrete REC.ipynb,
notebooks/coding/REC Coding.ipynb).

Demonstrates, on one tiny Gaussian pair:
  * importance-sampling REC: index <-> bit-exact sample round trip,
  * beam-search REC over KL partitions,
  * codelength vs the KL lower bound across a KL sweep.

Usage: python examples/discrete_rec_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rec_tpu.coding import BeamSearchCoder, GaussianParams, kl_divergence
from rec_tpu.coding.importance import (decode_gaussian_importance_sample,
                                       encode_gaussian_importance_sample)

LOG2 = float(np.log(2.0))


def single_partition_demo():
    print("=== single-partition importance REC ===")
    target = GaussianParams(jnp.asarray([1.2, -0.4], jnp.float32),
                            jnp.asarray([0.3, 0.5], jnp.float32))
    coder = GaussianParams(jnp.zeros(2, jnp.float32),
                           jnp.ones(2, jnp.float32))
    kl = float(jnp.sum(kl_divergence(target, coder)))
    bits = max(int(np.ceil(kl / LOG2)) + 2, 4)
    key = jax.random.PRNGKey(0)
    idx, sample = encode_gaussian_importance_sample(target, coder, key, bits)
    recon = decode_gaussian_importance_sample(coder, idx, key, bits)
    exact = bool(np.array_equal(np.asarray(sample), np.asarray(recon)))
    print(f"  KL={kl:.2f} nats -> {bits} bits, index={int(idx)}, "
          f"bit-exact decode: {exact}")
    assert exact


def kl_sweep():
    print("=== beam-search codelength vs KL ===")
    bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=8, extra_samples=1.2,
                          block_size=None, max_partitions=32)
    coder = GaussianParams(jnp.zeros(16, jnp.float32),
                           jnp.ones(16, jnp.float32))
    print(f"  {'KL (nats)':>10} {'partitions':>10} {'code bits':>10} "
          f"{'KL bits':>8}")
    for shift in (0.3, 0.6, 1.0, 1.5):
        target = GaussianParams(jnp.full(16, shift, jnp.float32),
                                jnp.full(16, 0.7, jnp.float32))
        kl = float(jnp.sum(kl_divergence(target, coder)))
        out = bsc.encode(target, coder, seed=1)
        decoded = bsc.decode(coder, out.indices, out.counts, seed=1)
        assert np.array_equal(np.asarray(out.sample), np.asarray(decoded))
        bits = float(bsc.codelength_nats(out) / LOG2)
        print(f"  {kl:10.2f} {int(out.counts[0]):10d} {bits:10.1f} "
              f"{kl / LOG2:8.1f}")


if __name__ == "__main__":
    single_partition_demo()
    kl_sweep()
