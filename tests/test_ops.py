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


class TestFusedBeamStep:
    @pytest.mark.parametrize("stream", ["fmix", "threefry"])
    def test_interpret_parity_with_padding(self, stream):
        # ADVICE r1: cover BOTH padding paths of the per-beam-grid
        # structure — S not divisible by 8 (sublane pad) and D not
        # divisible by 128 (lane pad) — against the rng.normal_stream +
        # quadratic reference scorer, through the Pallas interpreter on CPU.
        # Row addressing: one key per beam, candidate s = counter rows
        # [s*D, (s+1)*D) of that key's stream.
        from rec_tpu.coding import rng as crng
        from rec_tpu.ops.fused_beam_step import fused_candidate_scores

        B, S, D = 3, 5, 200
        rs = np.random.RandomState(7)
        root = jax.random.PRNGKey(123)
        beam_keys = jax.vmap(lambda b: jax.random.fold_in(root, b))(
            jnp.arange(B))

        beams = jnp.asarray(rs.randn(B, D), jnp.float32)
        aux_scale = jnp.asarray(np.exp(0.2 * rs.randn(D)), jnp.float32)
        a = jnp.asarray(0.1 * rs.randn(D), jnp.float32)
        b = jnp.asarray(rs.randn(D), jnp.float32)
        c_sum = jnp.float32(1.75)

        got = fused_candidate_scores(beam_keys.astype(jnp.uint32), beams,
                                     aux_scale, a, b, c_sum, S=S, D=D,
                                     stream=stream, interpret=True)

        eps = jax.vmap(lambda k: crng.normal_stream(k, (S, D),
                                                    stream=stream))(beam_keys)
        x = beams[:, None, :] + aux_scale * eps
        want = jnp.sum((a * x + b) * x, axis=-1) + c_sum

        assert got.shape == (B, S)
        # erfinv op-ordering differences are ~1 ulp per element; summed over
        # D=200 they stay far below any score gap that could flip a top-k.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)


class TestNormalStreamRow:
    @pytest.mark.parametrize("stream", ["fmix", "threefry"])
    def test_row_matches_chunk(self, stream):
        """normal_stream_row must be BIT-exact to the chunk's row — it is
        how winners and the decode replay regenerate candidate rows."""
        from rec_tpu.coding import rng as crng

        key = jax.random.PRNGKey(9)
        S, D = 7, 130
        chunk = crng.normal_stream(key, (S, D), stream=stream)
        for row in (0, 3, 6):
            got = crng.normal_stream_row(key, jnp.asarray(row), S, D,
                                         stream=stream)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(chunk[row]))


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
