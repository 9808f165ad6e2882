"""Kernel-support ops tests: threefry/normal replication, quadratic scorer.

The pallas kernels themselves only run on TPU; these tests validate the
mathematical foundations on CPU (the replication module is pure jnp), and
the kernels' TPU parity is driven by the verify skill.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding.gauss import GaussianParams
from rec_tpu.ops.beam_score import score_candidates
from rec_tpu.ops.threefry_normal import (bits_to_normal, normal_row,
                                         random_bits)


class TestThreefryReplication:
    @pytest.mark.parametrize("seed", [0, 42, 2 ** 31 - 1])
    def test_bits_bit_exact(self, seed):
        key = jax.random.PRNGKey(seed)
        kd = jax.random.key_data(key)
        for n in (8, 1000, 1001):  # odd sizes too
            ref = jax.random.bits(key, (n,), dtype=jnp.uint32)
            mine = random_bits(kd[0], kd[1],
                               jnp.arange(n, dtype=jnp.uint32))
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(mine))

    @pytest.mark.parametrize("seed", [1, 777])
    def test_normals_value_faithful(self, seed):
        key = jax.random.PRNGKey(seed)
        kd = jax.random.key_data(key)
        ref = jax.random.normal(key, (4096,))
        mine = normal_row(kd, 4096)
        # erfinv op-ordering differences stay ~1 ulp — far below the bf16
        # rounding used for scoring.
        np.testing.assert_allclose(np.asarray(mine), np.asarray(ref),
                                   rtol=0, atol=3e-6)
        assert float(jnp.mean(ref == mine)) > 0.9

    def test_normal_statistics(self):
        kd = jax.random.key_data(jax.random.PRNGKey(3))
        x = np.asarray(normal_row(kd, 100_000))
        assert abs(x.mean()) < 0.02 and abs(x.std() - 1.0) < 0.02


class TestScoreCandidates:
    def test_matches_direct_log_ratio(self):
        rs = np.random.RandomState(0)
        B, S, D = 4, 6, 32
        x = jnp.asarray(rs.randn(B, S, D), jnp.float32)
        num = GaussianParams(jnp.asarray(0.3 * rs.randn(D), jnp.float32),
                             jnp.asarray(np.exp(0.1 * rs.randn(D)),
                                         jnp.float32))
        den = GaussianParams(jnp.zeros(D, jnp.float32),
                             jnp.ones(D, jnp.float32))
        got = score_candidates(x, num, den, use_pallas=False)
        want = jnp.sum(num.log_prob(x) - den.log_prob(x), axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
