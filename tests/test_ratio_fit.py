"""Aux-variance-ratio fitting tests (ref coder.py:266-410; the reference's
own test_coder.py:23-40 exercises learned ratios only through a round trip —
these check the fitter's semantics directly, plus the round trip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder, GaussianParams
from rec_tpu.coding.gauss import (auxiliary_coder, auxiliary_target,
                                  kl_divergence)
from rec_tpu.coding.ratio_fit import RatioFitConfig, RatioFitter


def _pair(key, num_blocks=6, dim=80, kl_scale=1.0):
    k1, k2 = jax.random.split(key)
    target = GaussianParams(
        jax.random.normal(k1, (num_blocks, dim)) * 0.5 * kl_scale,
        jnp.exp(0.1 * jax.random.normal(k2, (num_blocks, dim))))
    coder = GaussianParams(jnp.zeros((num_blocks, dim)),
                           jnp.ones((num_blocks, dim)))
    return target, coder


class TestRatioFitter:
    def test_fitted_ratios_hit_omega(self):
        """The fitted top-level ratio must size the first auxiliary variable
        so its KL lands at (or hinge-below) Omega — the fitter's defining
        property (ref coder.py:320-335)."""
        omega = 2.0
        fitter = RatioFitter(RatioFitConfig(kl_per_partition=omega),
                             max_partitions=16)
        target, coder = _pair(jax.random.PRNGKey(0), kl_scale=1.5)
        fitter.update(target, coder, jax.random.PRNGKey(1))

        total_kl = jnp.sum(kl_divergence(target, coder), axis=-1)
        n_aux = 1 + int(jnp.floor(jnp.max(total_kl) / omega))
        r_top = fitter.ratios[n_aux - 1]
        assert 0.0 < r_top < 1.0
        aux_var = r_top * coder.var
        aux_kl = jnp.sum(kl_divergence(
            auxiliary_target(target, coder, aux_var),
            auxiliary_coder(coder, aux_var)), axis=-1)
        # Hinge losses only penalize exceeding the budgets, so fitted
        # aux-KL must not exceed Omega by more than optimization slack.
        assert float(jnp.max(aux_kl)) < omega * 1.2

    def test_running_average_and_fallback(self):
        fitter = RatioFitter(RatioFitConfig(kl_per_partition=2.0),
                             max_partitions=12)
        target, coder = _pair(jax.random.PRNGKey(2))
        fitter.update(target, coder, jax.random.PRNGKey(3))
        counts1 = fitter.counts.copy()
        fitter.update(target, coder, jax.random.PRNGKey(4))
        assert np.all(fitter.counts >= counts1)

        table = fitter.fitted()
        assert len(table) == 12 and table[0] == 1.0
        # Unfitted deep entries fall back to the power law, not 0/last-entry
        # (the round-1 extrapolation bug class).
        from rec_tpu.coding.partition import aux_variance_ratio
        assert table[-1] == pytest.approx(float(aux_variance_ratio(11)))

    def test_fitted_table_roundtrips(self):
        """A coder armed with the fitted table must still decode bit-exactly
        (the reference's test_coder.py:23-40 oracle)."""
        fitter = RatioFitter(RatioFitConfig(kl_per_partition=3.0),
                             max_partitions=12)
        target, coder = _pair(jax.random.PRNGKey(5), num_blocks=4, dim=120,
                              kl_scale=2.0)
        fitter.update(target, coder, jax.random.PRNGKey(6))

        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                              extra_samples=1.2, block_size=120,
                              max_partitions=12,
                              aux_variance_ratios=fitter.fitted())
        flat_t = GaussianParams(target.loc.reshape(-1),
                                target.scale.reshape(-1))
        flat_c = GaussianParams(coder.loc.reshape(-1),
                                coder.scale.reshape(-1))
        out = bsc.encode(flat_t, flat_c, 99)
        dec = bsc.decode(flat_c, out.indices, out.counts, 99)
        np.testing.assert_array_equal(np.asarray(out.sample),
                                      np.asarray(dec))
