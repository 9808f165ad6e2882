"""Off-distribution robustness (round 5): bounded scale heads, finite
budget probes, and the eval CLI's budget cap.

Driven by a real failure: a fully held-out photograph (pygame's empty-room
webcam image) through the corpus-trained LargeResNetVAE produced an
underflowed posterior scale and an 8.9-million-partition probed coding
budget, wedging the eval.  The contract under such inputs is graceful
degradation: finite numbers everywhere, a capped budget, loud saturation —
and the residual stream still guarantees exact pixels (tested end-to-end
in tests/test_lossless_file.py; here we pin the guard rails themselves).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder
from rec_tpu.coding.gauss import GaussianParams
from rec_tpu.models.resnet_vae import _bounded_exp


class TestBoundedExp:
    def test_identity_in_distribution(self):
        # Trained log-scales live within a few nats of 0: the clip must be
        # a bit-exact identity there (same compiled op on the same value).
        ls = jnp.asarray(np.linspace(-11.9, 11.9, 257), jnp.float32)
        np.testing.assert_array_equal(np.asarray(_bounded_exp(ls)),
                                      np.asarray(jnp.exp(ls)))

    def test_clamps_extremes_finite_nonzero(self):
        ls = jnp.asarray([-1e4, -80.0, 80.0, 1e4], jnp.float32)
        out = np.asarray(_bounded_exp(ls))
        assert np.all(np.isfinite(out)) and np.all(out > 0)
        np.testing.assert_allclose(out[:2], np.exp(-12.0), rtol=1e-6)
        np.testing.assert_allclose(out[2:], np.exp(12.0), rtol=1e-6)

    def test_gradient_zero_outside_window(self):
        g = jax.grad(lambda x: _bounded_exp(x).sum())(
            jnp.asarray([-50.0, 0.0, 50.0], jnp.float32))
        g = np.asarray(g)
        assert g[0] == 0.0 and g[2] == 0.0 and g[1] == pytest.approx(1.0)


class TestFiniteBudgetProbe:
    def _coder(self):
        return BeamSearchCoder(kl_per_partition=3.0, n_beams=3,
                               extra_samples=1.0, block_size=64,
                               max_partitions=8)

    def test_underflowed_scale_reports_finite(self):
        # scale ~0 target vs unit coder: per-dim KL is astronomically
        # large (log-ratio term), historically inf -> int() crash or a
        # garbage multi-million requirement.
        t = GaussianParams(jnp.full((64,), 30.0), jnp.full((64,), 1e-30))
        c = GaussianParams(jnp.zeros((64,)), jnp.ones((64,)))
        need = self._coder().required_partitions(t, c, 0)
        assert isinstance(need, int) and 0 < need <= 2 ** 24

    def test_nan_stats_report_finite(self):
        t = GaussianParams(jnp.full((64,), jnp.nan), jnp.ones((64,)))
        c = GaussianParams(jnp.zeros((64,)), jnp.ones((64,)))
        need = self._coder().required_partitions(t, c, 0)
        assert isinstance(need, int) and 0 < need <= 2 ** 24

    def test_sane_inputs_unchanged(self):
        rs = np.random.RandomState(0)
        t = GaussianParams(jnp.asarray(rs.randn(64), jnp.float32),
                           jnp.asarray(np.exp(0.1 * rs.randn(64)),
                                       jnp.float32))
        c = GaussianParams(jnp.zeros((64,)), jnp.ones((64,)))
        need = self._coder().required_partitions(t, c, 0)
        assert 1 <= need < 100


class TestBudgetCap:
    def test_grow_budget_caps_and_warns(self, caplog):
        import examples.lossless.compression_performance as cp
        import logging

        cfg = cp.Config(max_budget=256)
        coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=3,
                                extra_samples=1.0, block_size=64,
                                max_partitions=8)
        log = logging.getLogger("test_budget_cap")
        with caplog.at_level(logging.WARNING, logger="test_budget_cap"):
            grown = cp.grow_budget(cfg, log, coder, 8_900_000)
        assert grown.max_partitions == 256
        assert any("max_budget" in r.message for r in caplog.records)

    def test_grow_budget_under_cap_headroom(self, caplog):
        import examples.lossless.compression_performance as cp
        import logging

        cfg = cp.Config(max_budget=8192)
        coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=3,
                                extra_samples=1.0, block_size=64,
                                max_partitions=8)
        grown = cp.grow_budget(cfg, logging.getLogger("t"), coder, 100)
        # 25% headroom, x8 rounding, untouched by the cap.
        assert grown.max_partitions == 128
