"""Encode->decode round-trip bit-exactness — the de-facto correctness oracle
of the whole system (ref rec/coding/tests/test_coder.py:12-67).

Bit-exact means *exact float equality*: the decoder regenerates the identical
proposal streams from (seed, indices) alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder, GaussianCoder, GaussianParams
from rec_tpu.coding.gauss import kl_divergence


def _needle(d=8):
    """The reference oracle: a low-KL 'needle' target vs a standard coder
    (ref test_coder.py:12-21 uses N(5.1, 0.001) in 1D)."""
    target = GaussianParams(jnp.full((d,), 5.1 / d, jnp.float32),
                            jnp.full((d,), 0.05, jnp.float32))
    coder = GaussianParams(jnp.zeros((d,), jnp.float32),
                           jnp.ones((d,), jnp.float32))
    return target, coder


def _random_latent(seed, shape=(4, 6, 3), kl_scale=0.25):
    k = np.random.RandomState(seed)
    coder = GaussianParams(jnp.zeros(shape, jnp.float32),
                           jnp.ones(shape, jnp.float32))
    target = GaussianParams(
        jnp.asarray(kl_scale * k.randn(*shape), jnp.float32),
        jnp.asarray(np.exp(0.2 * k.randn(*shape) - 0.15), jnp.float32))
    return target, coder


class TestBeamSearchRoundTrip:
    def test_needle(self):
        target, coder = _needle()
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=5,
                              extra_samples=1.2, block_size=None,
                              max_partitions=16)
        coded = bsc.encode(target, coder, seed=42)
        decoded = bsc.decode(coder, coded.indices, coded.counts, seed=42)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))

    def test_multiblock_latent(self):
        target, coder = _random_latent(0)
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                              extra_samples=1.2, block_size=16,
                              max_partitions=16)
        coded = bsc.encode(target, coder, seed=7)
        decoded = bsc.decode(coder, coded.indices, coded.counts, seed=7)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))
        assert decoded.shape == coder.loc.shape
        # codelength positive and finite
        assert float(bsc.codelength_nats(coded)) > 0

    def test_sample_quality(self):
        """Coded samples should look like target samples: mean log density
        ratio of the coded sample is positive (ref test_samplers.py:10-41)."""
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=8,
                              extra_samples=1.5, block_size=None,
                              max_partitions=16)
        ratios = []
        for seed in range(5):
            target, coder = _random_latent(seed, shape=(24,), kl_scale=0.3)
            coded = bsc.encode(target, coder, seed=seed)
            lr = jnp.sum(target.log_prob(coded.sample)
                         - coder.log_prob(coded.sample))
            ratios.append(float(lr))
        assert np.mean(ratios) > 0.0

    def test_different_seed_different_sample(self):
        target, coder = _needle()
        bsc = BeamSearchCoder(n_beams=4, block_size=None, max_partitions=8)
        c1 = bsc.encode(target, coder, seed=1)
        c2 = bsc.encode(target, coder, seed=2)
        assert not np.array_equal(np.asarray(c1.sample), np.asarray(c2.sample))


class TestGaussianCoderRoundTrip:
    def test_needle(self):
        target, coder = _needle()
        gc = GaussianCoder(kl_per_partition=3.0, coding_bits=8,
                           block_size=None, max_partitions=16,
                           candidate_chunk=64)
        coded = gc.encode(target, coder, seed=42)
        decoded = gc.decode(coder, coded.indices, coded.counts, seed=42)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))

    def test_multiblock_latent(self):
        target, coder = _random_latent(3)
        gc = GaussianCoder(kl_per_partition=3.0, coding_bits=8,
                           block_size=16, max_partitions=16,
                           candidate_chunk=64)
        coded = gc.encode(target, coder, seed=5)
        decoded = gc.decode(coder, coded.indices, coded.counts, seed=5)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))
        assert float(gc.codelength_nats(coded)) > 0

    def test_learned_ratios(self):
        """Round trip with a learned aux-variance-ratio table
        (ref test_coder.py:23-40)."""
        target, coder = _random_latent(4, shape=(32,), kl_scale=0.3)
        ratios = tuple(float((i + 1.0) ** -0.7) for i in range(16))
        gc = GaussianCoder(coding_bits=8, block_size=None, max_partitions=16,
                           candidate_chunk=64, aux_variance_ratios=ratios)
        coded = gc.encode(target, coder, seed=11)
        decoded = gc.decode(coder, coded.indices, coded.counts, seed=11)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))


class TestProductionSizeRoundTrip:
    """Bit-exactness at the paper's production settings (B=20, S=36,
    block_size=1000).  Small-D tests compile encode and decode to programs
    that happen to agree; at D=1000 XLA fuses the two programs' float chains
    differently, and only the pinned replay (coding/utils.pin) + the
    encoder-embeds-decoder construction keep them bit-identical.  This is a
    regression test for exactly that failure (1-ULP drift at D=1000 that
    silently corrupts the lossless residual path)."""

    SHAPE = (4, 4, 130)  # 2080 dims -> 3 blocks of 1000 (padded tail)

    def test_beam_paper_settings(self):
        target, coder = _random_latent(21, shape=self.SHAPE, kl_scale=0.22)
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=20,
                              extra_samples=1.2, block_size=1000,
                              max_partitions=24)
        coded = bsc.encode(target, coder, seed=97)
        decoded = bsc.decode(coder, coded.indices, coded.counts, seed=97)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))

    def test_importance_production(self):
        target, coder = _random_latent(22, shape=self.SHAPE, kl_scale=0.22)
        gc = GaussianCoder(kl_per_partition=3.0, coding_bits=12,
                           block_size=1000, max_partitions=24)
        coded = gc.encode(target, coder, seed=98)
        decoded = gc.decode(coder, coded.indices, coded.counts, seed=98)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))

    def test_decode_stable_inside_larger_program(self):
        """The pinned replay must produce identical bits when the decode is
        embedded in a bigger jitted program (the models' in-graph passes)."""
        target, coder = _random_latent(23, shape=self.SHAPE, kl_scale=0.22)
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=20,
                              extra_samples=1.2, block_size=1000,
                              max_partitions=24)
        coded = bsc.encode(target, coder, seed=99)
        plain = bsc.decode(coder, coded.indices, coded.counts, seed=99)
        embedded = jax.jit(
            lambda i, n: jnp.tanh(
                bsc.decode(coder, i, n, seed=99) * 1.0001))(
                    coded.indices, coded.counts)
        np.testing.assert_array_equal(
            np.asarray(embedded),
            np.asarray(jnp.tanh(plain * 1.0001)))


class TestSharedPool:
    """The shared-candidate-pool fast mode (beam_search shared_pool=True):
    B x less candidate generation, MXU-matmul scoring, distinct stream
    contract."""

    def test_roundtrip(self):
        target, coder = _random_latent(31, shape=(4, 4, 130), kl_scale=0.22)
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=20,
                              extra_samples=1.2, block_size=1000,
                              max_partitions=24, shared_pool=True)
        coded = bsc.encode(target, coder, seed=55)
        decoded = bsc.decode(coder, coded.indices, coded.counts, seed=55)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(decoded))

    def test_sample_quality(self):
        """Shared-pool samples trade some quality for speed but must still
        look like target samples (positive mean log density ratio)."""
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=8,
                              extra_samples=1.5, block_size=None,
                              max_partitions=16, shared_pool=True)
        ratios = []
        for seed in range(5):
            target, coder = _random_latent(seed, shape=(24,), kl_scale=0.3)
            coded = bsc.encode(target, coder, seed=seed)
            lr = jnp.sum(target.log_prob(coded.sample)
                         - coder.log_prob(coded.sample))
            ratios.append(float(lr))
        assert np.mean(ratios) > 0.0

    def test_distinct_stream_contract(self):
        """shared_pool is part of the stream contract: its indices are drawn
        from different streams than the per-beam mode's."""
        target, coder = _random_latent(32, shape=(40,), kl_scale=0.35)
        base = dict(kl_per_partition=3.0, n_beams=8, extra_samples=1.2,
                    block_size=None, max_partitions=16)
        a = BeamSearchCoder(**base).encode(target, coder, seed=7)
        b = BeamSearchCoder(shared_pool=True, **base).encode(
            target, coder, seed=7)
        assert not np.array_equal(np.asarray(a.sample), np.asarray(b.sample))


class TestDeterminism:
    def test_vmapped_stream_equals_scalar_stream(self):
        """The vmap'd per-beam candidate generation must equal per-key calls:
        this is what makes encode(B beams) and decode(1 beam) coherent."""
        from rec_tpu.coding import rng
        skey = jax.random.PRNGKey(123)
        hashes = jnp.asarray([17, 4242, 999999], jnp.uint32)
        batched = jax.vmap(
            lambda h: rng.normal_stream(rng.beam_stream_key(skey, h), (6, 9))
        )(hashes)
        for i, h in enumerate(hashes):
            single = rng.normal_stream(rng.beam_stream_key(skey, h), (6, 9))
            np.testing.assert_array_equal(np.asarray(batched[i]),
                                          np.asarray(single))

    def test_encode_is_deterministic(self):
        target, coder = _random_latent(6)
        bsc = BeamSearchCoder(n_beams=4, block_size=16, max_partitions=16)
        c1 = bsc.encode(target, coder, seed=3)
        c2 = bsc.encode(target, coder, seed=3)
        np.testing.assert_array_equal(np.asarray(c1.indices),
                                      np.asarray(c2.indices))
        np.testing.assert_array_equal(np.asarray(c1.sample),
                                      np.asarray(c2.sample))


class TestImportanceExtensions:
    def test_finite_alpha_roundtrip(self):
        """Gumbel-perturbed (finite-alpha) selection still decodes bit-exact
        (the perturbation is encoder-only)."""
        from rec_tpu.coding.importance import (
            decode_gaussian_importance_sample,
            encode_gaussian_importance_sample)
        target, coder = _needle()
        key = jax.random.PRNGKey(9)
        idx, sample = encode_gaussian_importance_sample(
            target, coder, key, coding_bits=8, candidate_chunk=64,
            alpha=2.0)
        recon = decode_gaussian_importance_sample(coder, idx, key,
                                                  coding_bits=8,
                                                  candidate_chunk=64)
        np.testing.assert_array_equal(np.asarray(sample), np.asarray(recon))

    def test_custom_weighting_fn(self):
        """SNIS-style custom scorer: selects by an arbitrary energy, decodes
        bit-exact (ref importance_sampling.py:234-238)."""
        from rec_tpu.coding.importance import (
            decode_gaussian_importance_sample,
            encode_gaussian_importance_sample)
        proposal = GaussianParams(jnp.zeros(2), jnp.ones(2))
        energy = lambda eps: -jnp.sum(jnp.square(eps - 1.5), axis=-1)
        key = jax.random.PRNGKey(10)
        idx, sample = encode_gaussian_importance_sample(
            proposal, proposal, key, coding_bits=10, candidate_chunk=128,
            log_weighting_fn=energy)
        recon = decode_gaussian_importance_sample(proposal, idx, key,
                                                  coding_bits=10,
                                                  candidate_chunk=128)
        np.testing.assert_array_equal(np.asarray(sample), np.asarray(recon))
        # the energy pulled the selection toward (1.5, 1.5)
        assert float(jnp.linalg.norm(sample - 1.5)) < 1.5


class TestFmixStream:
    """The "fmix" candidate stream (rng.normal_stream): statistical quality
    and codec-level parity with the threefry default.  The stream is part of
    the coding contract, so it gets the same oracle battery: bit-exact round
    trips and coded-sample quality."""

    def test_moments_and_correlations(self):
        from rec_tpu.coding import rng
        key = jax.random.PRNGKey(5)
        x = np.asarray(rng.normal_stream(key, (200_000,), stream="fmix"))
        assert abs(x.mean()) < 0.01
        assert abs(x.std() - 1.0) < 0.01
        assert abs(float(np.mean(x ** 3))) < 0.03          # skew
        assert abs(float(np.mean(x ** 4)) - 3.0) < 0.08    # kurtosis
        for lag in (1, 2, 7, 64, 128, 1000):
            c = np.corrcoef(x[:-lag], x[lag:])[0, 1]
            assert abs(c) < 0.01, (lag, c)
        # Neighbouring fold_in keys (the beam/candidate address layout) must
        # decohere: same counters, adjacent keys.
        y = np.asarray(rng.normal_stream(jax.random.fold_in(key, 1),
                                         (200_000,), stream="fmix"))
        assert abs(np.corrcoef(x, y)[0, 1]) < 0.01

    def test_bit_uniformity(self):
        from rec_tpu.coding import rng
        kd = jax.random.key_data(jax.random.PRNGKey(9)).astype(jnp.uint32)
        bits = np.asarray(rng.fmix_bits(kd[0], kd[1],
                                        jnp.arange(1 << 16, dtype=jnp.uint32)))
        for b in range(32):
            frac = float(np.mean((bits >> b) & 1))
            assert abs(frac - 0.5) < 0.01, (b, frac)

    @pytest.mark.parametrize("coder_cls,kwargs", [
        (BeamSearchCoder, dict(n_beams=4, block_size=16, max_partitions=16)),
        (GaussianCoder, dict(coding_bits=8, block_size=16, max_partitions=16)),
    ])
    def test_roundtrip_bit_exact(self, coder_cls, kwargs):
        target, coder = _random_latent(21)
        c = coder_cls(stream="fmix", **kwargs)
        coded = c.encode(target, coder, seed=11)
        dec = c.decode(coder, coded.indices, coded.counts, seed=11)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(dec))
        # Different stream => different bits (the flag really is contractual).
        c2 = coder_cls(stream="threefry", **kwargs)
        dec_tf = c2.decode(coder, coded.indices, coded.counts, seed=11)
        assert not np.array_equal(np.asarray(dec_tf), np.asarray(dec))

    def test_sample_quality_parity_with_threefry(self):
        """Coded-sample quality (sum log q/p, the beam-search objective) must
        match threefry's on the same targets — a weak mixer would show up
        here as systematically worse selected samples."""
        from rec_tpu.coding.gauss import log_density_ratio
        target, coder = _random_latent(33, shape=(500,), kl_scale=0.9)

        def quality(stream):
            bsc = BeamSearchCoder(n_beams=5, block_size=250,
                                  max_partitions=16, stream=stream)
            coded = bsc.encode(target, coder, seed=17)
            q = jnp.sum(log_density_ratio(coded.sample, target, coder))
            return float(q), np.asarray(coded.counts)

        q_tf, n_tf = quality("threefry")
        q_fm, n_fm = quality("fmix")
        np.testing.assert_array_equal(n_tf, n_fm)  # same KL => same rate
        # Same rate, so quality should match within a few nats of noise.
        assert q_fm > q_tf - 0.15 * abs(q_tf), (q_tf, q_fm)


class TestBatchedBlockEquivalence:
    """encode_blocks/decode_blocks (partition scan outermost + scalar-cond
    early exit) must produce EXACTLY what vmap of the per-block functions
    produces — same streams, same indices, same counts, same samples."""

    def _pair(self, seed, N=5, D=64):
        rs = np.random.RandomState(seed)
        t = GaussianParams(
            jnp.asarray(0.3 * rs.randn(N, D), jnp.float32),
            jnp.asarray(np.exp(0.1 * rs.randn(N, D)), jnp.float32))
        c = GaussianParams(jnp.zeros((N, D), jnp.float32),
                           jnp.ones((N, D), jnp.float32))
        return t, c

    def test_beam_search(self):
        from rec_tpu.coding import rng
        from rec_tpu.coding.beam_search import (BeamSearchConfig,
                                                decode_block, decode_blocks,
                                                encode_block, encode_blocks)
        cfg = BeamSearchConfig(n_beams=4, max_partitions=12)
        t, c = self._pair(3)
        bkeys = jax.vmap(lambda b: rng.block_key(rng.root_key(5), b))(
            jnp.arange(5))
        batched = encode_blocks(cfg, t, c, bkeys)
        single = jax.vmap(
            lambda tb, cb, kb: encode_block(cfg, tb, cb, kb))(t, c, bkeys)
        np.testing.assert_array_equal(np.asarray(batched.indices),
                                      np.asarray(single.indices))
        np.testing.assert_array_equal(np.asarray(batched.count),
                                      np.asarray(single.count))
        db = decode_blocks(cfg, c, batched.indices, batched.count, bkeys)
        ds = jax.vmap(
            lambda cb, ib, nb, kb: decode_block(cfg, cb, ib, nb, kb)
        )(c, batched.indices, batched.count, bkeys)
        np.testing.assert_array_equal(np.asarray(db), np.asarray(ds))

    def test_importance(self):
        from rec_tpu.coding import rng
        from rec_tpu.coding.importance import (ImportanceCoderConfig,
                                               decode_block, decode_blocks,
                                               encode_block, encode_blocks)
        cfg = ImportanceCoderConfig(coding_bits=8, max_partitions=12)
        t, c = self._pair(4)
        bkeys = jax.vmap(lambda b: rng.block_key(rng.root_key(6), b))(
            jnp.arange(5))
        batched = encode_blocks(cfg, t, c, bkeys)
        single = jax.vmap(
            lambda tb, cb, kb: encode_block(cfg, tb, cb, kb))(t, c, bkeys)
        np.testing.assert_array_equal(np.asarray(batched.indices),
                                      np.asarray(single.indices))
        np.testing.assert_array_equal(np.asarray(batched.count),
                                      np.asarray(single.count))
        db = decode_blocks(cfg, c, batched.indices, batched.count, bkeys)
        ds = jax.vmap(
            lambda cb, ib, nb, kb: decode_block(cfg, cb, ib, nb, kb)
        )(c, batched.indices, batched.count, bkeys)
        np.testing.assert_array_equal(np.asarray(db), np.asarray(ds))
