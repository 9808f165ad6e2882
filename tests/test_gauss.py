"""Property tests for the auxiliary-variable Gaussian decomposition.

The marginalization identity is the correctness core: sampling A ~ q(A) then
Z | A ~ q(Z | A) must reproduce Z ~ q exactly (and likewise for p).  The
reference has no such test; its formulas (coder.py:141-171) are verified here
both analytically (closed-form marginals) and by Monte Carlo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding.gauss import (GaussianParams, auxiliary_coder,
                                  auxiliary_target, conditional_coder,
                                  conditional_target, kl_divergence,
                                  log_density_ratio)


def _dists(seed=0, d=16):
    k = np.random.RandomState(seed)
    target = GaussianParams(jnp.asarray(k.randn(d), jnp.float32),
                            jnp.asarray(0.2 + k.rand(d), jnp.float32))
    coder = GaussianParams(jnp.asarray(k.randn(d), jnp.float32),
                           jnp.asarray(0.5 + k.rand(d), jnp.float32))
    return target, coder


def test_kl_matches_closed_form():
    target, coder = _dists()
    kl = kl_divergence(target, coder)
    # Independent closed form
    expected = (np.log(np.asarray(coder.scale) / np.asarray(target.scale))
                + (np.asarray(target.scale) ** 2
                   + (np.asarray(target.loc) - np.asarray(coder.loc)) ** 2)
                / (2 * np.asarray(coder.scale) ** 2) - 0.5)
    np.testing.assert_allclose(kl, expected, rtol=1e-5)
    assert bool(jnp.all(kl >= 0))


def test_aux_marginalization_identity_analytic():
    """E[Z] and Var[Z] of the two-stage sampling match the target exactly."""
    target, coder = _dists(1)
    for ratio in (0.1, 0.5, 0.9):
        aux_var = ratio * coder.var
        q_a = auxiliary_target(target, coder, aux_var)
        # Z | A=a ~ N(m(a), v) with m(a) linear in a:
        #   m(a) = p_loc + (a tq pv + (tl - pl) resid pv) / denom
        t_var, p_var = target.var, coder.var
        resid = p_var - aux_var
        denom = t_var * aux_var + p_var * resid
        slope = t_var * p_var / denom
        cond0 = conditional_target(target, coder, aux_var,
                                   jnp.zeros_like(target.loc))
        mean_z = cond0.loc + slope * q_a.loc
        var_z = cond0.var + jnp.square(slope) * q_a.var
        np.testing.assert_allclose(mean_z, target.loc, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(var_z, target.var, rtol=1e-4, atol=1e-5)


def test_coder_marginalization_identity():
    target, coder = _dists(2)
    aux_var = 0.37 * coder.var
    p_a = auxiliary_coder(coder, aux_var)
    cond = conditional_coder(coder, aux_var, jnp.zeros_like(coder.loc))
    np.testing.assert_allclose(cond.var + p_a.var, coder.var, rtol=1e-5)
    np.testing.assert_allclose(cond.loc, coder.loc, rtol=1e-5)


def test_full_ratio_collapses():
    """ratio -> 1 makes the aux step the whole problem: aux target is the
    coder-centred target and the conditional coder is a point mass."""
    target, coder = _dists(3)
    aux_var = coder.var
    q_a = auxiliary_target(target, coder, aux_var)
    np.testing.assert_allclose(q_a.loc, target.loc - coder.loc, rtol=1e-5)
    np.testing.assert_allclose(q_a.scale, target.scale, rtol=1e-4)
    cond = conditional_coder(coder, aux_var, jnp.zeros_like(coder.loc))
    np.testing.assert_allclose(cond.scale, 0.0, atol=1e-6)


def test_aux_kl_chain_sums_to_total():
    """KL[q(A)||p(A)] + E_q(A) KL[q(Z|A)||p(Z|A)] == KL[q||p] (chain rule).
    Monte Carlo over A."""
    target, coder = _dists(4, d=4)
    aux_var = 0.4 * coder.var
    q_a = auxiliary_target(target, coder, aux_var)
    p_a = auxiliary_coder(coder, aux_var)
    kl_a = kl_divergence(q_a, p_a)

    key = jax.random.PRNGKey(0)
    a = q_a.sample(key, (200_000,))
    cond_t = jax.vmap(lambda s: conditional_target(target, coder, aux_var, s))(a)
    cond_c = jax.vmap(lambda s: conditional_coder(coder, aux_var, s))(a)
    kl_cond = jnp.mean(kl_divergence(cond_t, cond_c), axis=0)

    total = kl_divergence(target, coder)
    np.testing.assert_allclose(kl_a + kl_cond, total, rtol=2e-2, atol=2e-3)


def test_log_density_ratio_quadratic_form():
    target, coder = _dists(5)
    x = jnp.asarray(np.random.RandomState(9).randn(16), jnp.float32)
    got = log_density_ratio(x, target, coder)
    want = target.log_prob(x) - coder.log_prob(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestRatioTableFallback:
    def test_beyond_table_uses_power_law(self):
        """A fitted ratio table shorter than the partition count must
        extrapolate with the power law, not reuse its last entry (reusing it
        mis-sizes the variance schedule and was measured to inflate a trained
        model's encode-side KL ~14x through the conditioning cascade)."""
        from rec_tpu.coding.partition import (AUX_RATIO_POWER_LAW,
                                              aux_variance_ratio)

        table = jnp.asarray([1.0, 0.6, 0.45, 0.38])
        # inside the table: table value
        np.testing.assert_allclose(float(aux_variance_ratio(2, table)), 0.45)
        # beyond the table: power law, not table[-1]
        for i in (4, 10, 100):
            np.testing.assert_allclose(
                float(aux_variance_ratio(i, table)),
                float((i + 1.0) ** AUX_RATIO_POWER_LAW), rtol=1e-6)

    def test_roundtrip_with_short_table(self):
        """Encode/decode stay bit-exact when counts exceed the fitted table
        (both sides extrapolate identically)."""
        from rec_tpu.coding import BeamSearchCoder, GaussianParams

        rs = np.random.RandomState(5)
        target = GaussianParams(
            jnp.asarray(0.9 * rs.randn(48), jnp.float32),
            jnp.asarray(np.exp(0.1 * rs.randn(48)), jnp.float32))
        coder_p = GaussianParams(jnp.zeros(48, jnp.float32),
                                 jnp.ones(48, jnp.float32))
        bsc = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                              extra_samples=1.2, block_size=None,
                              max_partitions=16,
                              aux_variance_ratios=(1.0, 0.6, 0.45, 0.38))
        coded = bsc.encode(target, coder_p, seed=3)
        assert int(jnp.max(coded.counts)) > 4  # exercises the fallback
        dec = bsc.decode(coder_p, coded.indices, coded.counts, seed=3)
        np.testing.assert_array_equal(np.asarray(coded.sample),
                                      np.asarray(dec))


class TestPartitionSchedule:
    """Closed-form schedule vs the reference-style sequential recurrence
    (ref coder.py:505-540) — the fast-vs-naive differential style of ref
    test_rejection_sampling.py."""

    def _recurrence(self, count, P, p_var, ratios=None):
        import numpy as np
        from rec_tpu.coding.partition import aux_variance_ratio

        p_var = np.asarray(p_var, np.float64)
        cum = np.zeros_like(p_var)
        aux_vars = np.zeros((P,) + p_var.shape)
        for t in range(count):
            i = count - 1 - t
            r = float(aux_variance_ratio(i, ratios))
            aux_vars[t] = r * np.maximum(p_var - cum, 0.0)
            cum = cum + aux_vars[t]
        return aux_vars, cum

    @pytest.mark.parametrize("count", [1, 3, 7])
    def test_matches_recurrence_power_law(self, count):
        import numpy as np
        from rec_tpu.coding.partition import partition_schedule

        P = 8
        p_var = np.asarray([1.0, 0.25, 4.0])
        w, c_after = partition_schedule(jnp.asarray(count), P)
        aux_ref, cum_ref = self._recurrence(count, P, p_var)
        aux_closed = np.asarray(w)[:, None] * p_var[None, :]
        np.testing.assert_allclose(aux_closed, aux_ref, rtol=1e-5, atol=1e-9)
        # The final partition (power-law r_0 = 1) absorbs ALL remaining
        # variance: cumulative fraction hits exactly 1.
        assert float(np.asarray(c_after)[count - 1]) == 1.0
        np.testing.assert_allclose(cum_ref, p_var, rtol=1e-6)
        # Dead lanes contribute nothing.
        assert np.all(np.asarray(w)[count:] == 0.0)

    def test_matches_recurrence_learned_table(self):
        import numpy as np
        from rec_tpu.coding.partition import partition_schedule

        P, count = 10, 6
        ratios = jnp.asarray([1.0, 0.55, 0.4, 0.3, 0.22, 0.2], jnp.float32)
        p_var = np.asarray([0.7, 2.0])
        w, c_after = partition_schedule(jnp.asarray(count), P, ratios)
        aux_ref, cum_ref = self._recurrence(count, P, p_var, ratios)
        np.testing.assert_allclose(np.asarray(w)[:, None] * p_var[None, :],
                                   aux_ref, rtol=1e-5, atol=1e-9)
        # Learned tables with r_0 = 1.0 also close the telescope exactly.
        np.testing.assert_allclose(float(np.asarray(c_after)[count - 1]),
                                   1.0, rtol=1e-6)
