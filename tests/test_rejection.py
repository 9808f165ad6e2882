"""Rejection sampler tests: fast-vs-naive buffer differential (ref
test_rejection_sampling.py), decode determinism and sample quality (ref
test_samplers.py), pseudo-generator consistency (ref test_sample_generator.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding.gauss import GaussianParams, log_density_ratio
from rec_tpu.coding.rejection import (RejectionSampler, RejectionSamplerConfig,
                                      estimate_mass, r_pstar_buffers,
                                      r_pstar_naive)
from rec_tpu.coding.sample_generator import (PseudoSampleGeneratorConfig,
                                             pseudo_ratios, pseudo_sample)
from rec_tpu.coding.utils import CodingError


def _needle():
    t = GaussianParams(jnp.asarray([3.0], jnp.float32),
                       jnp.asarray([0.001], jnp.float32))
    p = GaussianParams(jnp.asarray([0.0], jnp.float32),
                       jnp.asarray([1.0], jnp.float32))
    return t, p


class TestRPstarBuffers:
    @pytest.mark.parametrize("n_samples,buffer", [(10, 10000), (2, 100000)])
    def test_fast_matches_naive(self, n_samples, buffer):
        t, p = _needle()
        lr, tm, pm = estimate_mass(t, p, jax.random.PRNGKey(0),
                                   n_samples, 10)
        lr, tm, pm = np.asarray(lr), np.asarray(tm), np.asarray(pm)
        r_f, ps_f = r_pstar_buffers(lr, tm, pm, buffer)
        r_n, ps_n = r_pstar_naive(lr, tm, pm, buffer)
        np.testing.assert_allclose(r_f, r_n, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ps_f, ps_n, rtol=1e-5, atol=1e-5)

    def test_pstar_is_probability(self):
        t, p = _needle()
        lr, tm, pm = estimate_mass(t, p, jax.random.PRNGKey(1), 100, 100)
        _, ps = r_pstar_buffers(np.asarray(lr), np.asarray(tm),
                                np.asarray(pm), 5000)
        assert np.all(ps >= -1e-12) and np.all(ps <= 1.0 + 1e-9)
        assert np.all(np.diff(ps) >= -1e-12)  # monotone


class TestRejectionSampler:
    def _sampler(self):
        return RejectionSampler(RejectionSamplerConfig(
            sample_buffer_size=1000, r_buffer_size=10000, mass_samples=100,
            oversampling=100))

    def test_decode_bit_exact(self):
        t = GaussianParams(jnp.asarray([2.0], jnp.float32),
                           jnp.asarray([0.01], jnp.float32))
        p = GaussianParams(jnp.asarray([0.0], jnp.float32),
                           jnp.asarray([1.0], jnp.float32))
        s = self._sampler()
        key = jax.random.PRNGKey(42069)
        index, sample = s.coded_sample(t, p, key)
        recon = s.decode_sample(p, index, key)
        np.testing.assert_array_equal(np.asarray(sample), np.asarray(recon))

    def test_sample_quality(self):
        t = GaussianParams(jnp.asarray([2.0], jnp.float32),
                           jnp.asarray([0.01], jnp.float32))
        p = GaussianParams(jnp.asarray([0.0], jnp.float32),
                           jnp.asarray([1.0], jnp.float32))
        s = self._sampler()
        lps = []
        for seed in range(5):
            _, sample = s.coded_sample(t, p, jax.random.PRNGKey(seed))
            lps.append(float(jnp.sum(t.log_prob(sample) - p.log_prob(sample))))
        assert np.mean(lps) > 0.0

    def test_codelength_and_acceptance(self):
        t = GaussianParams(jnp.asarray([2.0], jnp.float32),
                           jnp.asarray([0.01], jnp.float32))
        p = GaussianParams(jnp.asarray([0.0], jnp.float32),
                           jnp.asarray([1.0], jnp.float32))
        s = self._sampler()
        key = jax.random.PRNGKey(42069)
        index, _ = s.coded_sample(t, p, key)
        s.update(t, p, jax.random.PRNGKey(1))
        s.update(t, p, jax.random.PRNGKey(2))
        total = s.acceptance_probabilities.sum() + s.spillover_probability
        assert abs(total - 1.0) < 1e-6
        assert s.get_codelength(index) > 0

    def test_kl_too_high_raises(self):
        t = GaussianParams(jnp.full((16,), 4.0, jnp.float32),
                           jnp.full((16,), 0.01, jnp.float32))
        p = GaussianParams(jnp.zeros((16,), jnp.float32),
                           jnp.ones((16,), jnp.float32))
        with pytest.raises(CodingError):
            self._sampler().coded_sample(t, p, jax.random.PRNGKey(0))


class TestPseudoSampleGenerator:
    def test_ratio_consistency(self):
        """get_ratios entries match recomputed log-ratios of the materialized
        samples (ref test_sample_generator.py:11-37)."""
        cfg = PseudoSampleGeneratorConfig(buffer_size=64, n_true_samples=8,
                                          n_groups=6)
        d = 10
        t = GaussianParams(jnp.full((d,), 0.1, jnp.float32),
                           jnp.full((d,), 0.1, jnp.float32))
        p = GaussianParams(jnp.zeros((d,), jnp.float32),
                           jnp.ones((d,), jnp.float32))
        key = jax.random.PRNGKey(420)
        ratios = pseudo_ratios(cfg, t, p, key)
        for i in (0, 5, 63):
            sample = pseudo_sample(cfg, p, key, i)
            direct = jnp.sum(log_density_ratio(sample, t, p))
            np.testing.assert_allclose(float(ratios[i]), float(direct),
                                       rtol=1e-4, atol=1e-4)


class TestRejectionCoder:
    """GaussianCoder + RejectionSampler round trip (ref test_coder.py:23-40)."""

    def test_roundtrip_bit_exact(self):
        from rec_tpu.coding.rejection_coder import RejectionCoder

        t = GaussianParams(jnp.asarray([2.0, -1.5, 0.3], jnp.float32),
                           jnp.asarray([0.05, 0.1, 0.2], jnp.float32))
        p = GaussianParams(jnp.zeros(3, jnp.float32),
                           jnp.ones(3, jnp.float32))
        rc = RejectionCoder(kl_per_partition=3.0,
                            sampler_config=RejectionSamplerConfig(
                                sample_buffer_size=1000, r_buffer_size=10000))
        indices, sample = rc.encode_block(t, p, seed=42)
        assert len(indices) >= 1
        recon = rc.decode_block(p, indices, seed=42)
        np.testing.assert_array_equal(np.asarray(sample), np.asarray(recon))

    def test_codelength_after_update(self):
        from rec_tpu.coding.rejection_coder import RejectionCoder

        t = GaussianParams(jnp.asarray([2.0], jnp.float32),
                           jnp.asarray([0.05], jnp.float32))
        p = GaussianParams(jnp.zeros(1, jnp.float32),
                           jnp.ones(1, jnp.float32))
        rc = RejectionCoder(sampler_config=RejectionSamplerConfig(
            sample_buffer_size=1000, r_buffer_size=5000))
        rc.encode_block(t, p, seed=1, update_sampler=True)
        indices, _ = rc.encode_block(t, p, seed=2)
        assert rc.get_codelength(indices) > 0


class TestRejectionExactness:
    """The rejection sampler is supposed to be an EXACT sampler of the
    target.  Distribution test added after the review finding that the
    reference's acceptance pairing (proposal i vs r_{i+1}/P*_{i+1}) biases
    samples (mean 0.70, std 0.52 for a N(0.5, 0.7) target)."""

    def test_coded_samples_match_target_distribution(self):
        from rec_tpu.coding.rejection import rejection_sample

        t = GaussianParams(jnp.asarray([0.5], jnp.float32),
                           jnp.asarray([0.7], jnp.float32))
        p = GaussianParams(jnp.asarray([0.0], jnp.float32),
                           jnp.asarray([1.0], jnp.float32))
        cfg = RejectionSamplerConfig(sample_buffer_size=1000,
                                     r_buffer_size=5000)
        lr, tm, pm = estimate_mass(t, p, jax.random.PRNGKey(0), 100, 100)
        r_buf, ps_buf = r_pstar_buffers(np.asarray(lr), np.asarray(tm),
                                        np.asarray(pm), cfg.r_buffer_size)
        r_buf = jnp.asarray(r_buf, jnp.float32)
        ps_buf = jnp.asarray(ps_buf, jnp.float32)
        std_t = t  # coder is already standard normal

        sample_many = jax.jit(jax.vmap(
            lambda k: rejection_sample(cfg, std_t, k, r_buf, ps_buf).sample),
            static_argnums=())
        keys = jax.random.split(jax.random.PRNGKey(1), 600)
        arr = np.asarray(sample_many(keys))[:, 0]
        # 600 samples: se(mean) ~ 0.029, se(std) ~ 0.02
        assert abs(arr.mean() - 0.5) < 0.1, arr.mean()
        assert abs(arr.std() - 0.7) < 0.09, arr.std()

    def test_fast_buffers_on_smooth_target(self):
        """The fast geometric-slice builder must track the defining
        recursion on smooth (non-needle) targets too (the reference's
        floor-division diverged by 2e-2 there)."""
        rs = np.random.RandomState(0)
        t = GaussianParams(jnp.asarray(0.4 * rs.randn(4), jnp.float32),
                           jnp.asarray(np.exp(0.1 * rs.randn(4)),
                                       jnp.float32))
        p = GaussianParams(jnp.zeros(4, jnp.float32),
                           jnp.ones(4, jnp.float32))
        lr, tm, pm = estimate_mass(t, p, jax.random.PRNGKey(3), 100, 100)
        lr, tm, pm = np.asarray(lr), np.asarray(tm), np.asarray(pm)
        r_f, ps_f = r_pstar_buffers(lr, tm, pm, 20000)
        r_n, ps_n = r_pstar_naive(lr, tm, pm, 20000)
        np.testing.assert_allclose(r_f, r_n, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ps_f, ps_n, rtol=1e-4, atol=1e-4)
