"""Benchmark: flagship RVAE-24 single-image REC encode throughput on one chip.

Paper eval settings (BASELINE.md): beam search B=20, extra_samples=1.2,
Omega=3, block_size=1000, num_res_blocks=24, CIFAR-sized 32x32 input.  The
whole compress (inference pass + 24-block generative pass with in-scan REC
coding + decode-replay) is ONE jitted program; we report steady-state
images/sec.

vs_baseline: the reference pins compression to CPU and its encode-runtime
heatmaps span 0-1000 s/image on 32x32 inputs at these settings
(reference examples/lossless/data_aggregation.py:46-47,
compression_performance.py:16); we use a conservative 100 s/image (0.01
images/sec) as the reference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

from rec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

REFERENCE_IMAGES_PER_SEC = 0.01  # conservative: 100 s/image on CPU


def main():
    from rec_tpu.coding import BeamSearchCoder
    from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                           ResNetVAEConfig)

    cfg = ResNetVAEConfig(num_res_blocks=24, deterministic_filters=160,
                          stochastic_filters=32)
    coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=20,
                            extra_samples=1.2, block_size=1000,
                            max_partitions=24)
    model = BidirectionalResNetVAE(cfg=cfg, coder=coder)

    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    compress = jax.jit(
        lambda p, img, seed: model.apply(p, img, seed,
                                         method=model.compress))
    # Timing is a data-dependent checksum chain materialized ONCE at the
    # end: np.asarray is the only reliable full-execution barrier over the
    # axon tunnel (block_until_ready can return before device completion
    # there), and chaining the outputs stops any caching/elision of
    # repeated dispatches while still allowing dispatch pipelining.
    def checksum(out):
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out)
                   if jnp.issubdtype(leaf.dtype, jnp.floating))

    np.asarray(checksum(compress(params, x, 1234)))  # compile + settle

    n = 10
    t0 = time.time()
    acc = 0.0
    for i in range(n):
        acc = acc + checksum(compress(params, x, 1234 + i))
    np.asarray(acc)
    dt = (time.time() - t0) / n

    value = 1.0 / dt
    print(json.dumps({
        "metric": "RVAE-24 single-image REC encode throughput (32x32, "
                  "B=20, eps=0.2, Omega=3), 1 chip",
        "value": round(value, 3),
        "unit": "images/sec",
        "vs_baseline": round(value / REFERENCE_IMAGES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
