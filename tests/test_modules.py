"""Unit tests for the custom NN modules (L0) and metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.models.modules import (GDN, AutoRegressiveMultiConv2D,
                                    ReparameterizedConv2D,
                                    ReparameterizedConv2DTranspose,
                                    SignalConv2D, conv_ar_mask, irdft_matrix,
                                    lower_bound)


class TestReparameterizedConv:
    def test_data_dependent_init_normalizes(self):
        """After DDI, per-channel outputs on the init batch have std ~
        init_scale and mean ~ 0 (the Salimans & Kingma weight-norm init)."""
        conv = ReparameterizedConv2D(features=8, kernel_size=(3, 3),
                                     init_scale=0.1)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 12, 12, 5),
                        jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x)
        out = conv.apply(params, x)
        std = np.asarray(jnp.std(out, axis=(0, 1, 2)))
        mean = np.asarray(jnp.mean(out, axis=(0, 1, 2)))
        np.testing.assert_allclose(std, 0.1, rtol=0.05)
        np.testing.assert_allclose(mean, 0.0, atol=1e-3)

    def test_strided(self):
        conv = ReparameterizedConv2D(features=4, kernel_size=(5, 5),
                                     strides=(2, 2))
        x = jnp.zeros((1, 16, 16, 3))
        params = conv.init(jax.random.PRNGKey(0), x)
        assert conv.apply(params, x).shape == (1, 8, 8, 4)

    def test_transpose_upsamples(self):
        conv = ReparameterizedConv2DTranspose(features=3, kernel_size=(5, 5),
                                              strides=(2, 2))
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 6),
                        jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x)
        assert conv.apply(params, x).shape == (2, 16, 16, 3)

    def test_ar_mask_causality(self):
        """A masked "a" conv's output at position (i, j, c) must not depend
        on inputs at or after (i, j, c) in raster-channel order."""
        conv = ReparameterizedConv2D(features=3, kernel_size=(3, 3), mask="a")
        x = jnp.zeros((1, 6, 6, 3))
        params = conv.init(jax.random.PRNGKey(0), x)

        def probe(x):
            return conv.apply(params, x)

        base = probe(x)
        # The reference mask zeroes the TOP kernel rows and LEFT columns
        # (ref reparameterized_convolutions.py:46-53 under correlation), so
        # the autoregressive order is bottom-to-top, right-to-left: outputs
        # strictly *after* the perturbed site in that order (rows below, or
        # same row further left... i.e. sites the mask declares as already
        # generated) must be unchanged.
        x2 = x.at[0, 2, 2, 1].set(5.0)
        delta = np.asarray(jnp.abs(probe(x2) - base))[0]
        assert delta[2, 2, 0] == 0 and delta[2, 2, 1] == 0  # self + earlier ch
        assert delta[3:].max() == 0            # rows below = already generated
        assert delta[2, 3:].max() == 0         # same row, right = generated
        # mask "b" includes self-channel
        mask_b = conv_ar_mask(3, 3, 3, 3, zerodiagonal=False)
        assert mask_b[1, 1, 1, 1] == 1
        mask_a = conv_ar_mask(3, 3, 3, 3, zerodiagonal=True)
        assert mask_a[1, 1, 1, 1] == 0


class TestGDN:
    def test_forward_inverse_shapes(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 6),
                        jnp.float32)
        for inverse in (False, True):
            gdn = GDN(inverse=inverse)
            params = gdn.init(jax.random.PRNGKey(0), x)
            out = gdn.apply(params, x)
            assert out.shape == x.shape
            assert bool(jnp.all(jnp.isfinite(out)))

    def test_gdn_normalizes_scale(self):
        """GDN divides by sqrt(beta + gamma x^2): large inputs shrink."""
        x = jnp.full((1, 4, 4, 2), 100.0)
        gdn = GDN(inverse=False)
        params = gdn.init(jax.random.PRNGKey(0), x)
        out = gdn.apply(params, x)
        assert float(jnp.max(jnp.abs(out))) < 100.0

    def test_lower_bound_gradient(self):
        g = jax.grad(lambda x: lower_bound(x, 1.0))(0.5)
        assert g == 0.0  # below bound, positive grad blocked
        g = jax.grad(lambda x: lower_bound(x, 1.0))(2.0)
        assert g == 1.0
        g = jax.grad(lambda x: -lower_bound(x, 1.0))(0.5)
        assert g == -1.0  # negative (escaping) grad passes


class TestSignalConv:
    def test_downsample_shape(self):
        conv = SignalConv2D(features=8, kernel=(5, 5), corr=True,
                            strides_down=2, padding="reflect")
        x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                        jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x)
        assert conv.apply(params, x).shape == (1, 16, 16, 8)

    def test_upsample_shape(self):
        conv = SignalConv2D(features=3, kernel=(5, 5), corr=False,
                            strides_up=2, padding="reflect")
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8),
                        jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x)
        assert conv.apply(params, x).shape == (1, 32, 32, 3)

    def test_upsample_shape_k3(self):
        conv = SignalConv2D(features=2, kernel=(3, 3), corr=False,
                            strides_up=2, padding="zeros")
        x = jnp.zeros((1, 7, 5, 4))
        params = conv.init(jax.random.PRNGKey(0), x)
        assert conv.apply(params, x).shape == (1, 14, 10, 2)

    def test_irdft_orthonormal(self):
        m = irdft_matrix((5, 5))
        np.testing.assert_allclose(m @ m.T, np.eye(25), atol=1e-5)

    def test_down_up_roundtrip_energy(self):
        """Down then up preserves shape through a Ballé-style pair."""
        down = SignalConv2D(features=4, kernel=(5, 5), corr=True,
                            strides_down=2)
        up = SignalConv2D(features=3, kernel=(5, 5), corr=False,
                          strides_up=2)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 24, 24, 3),
                        jnp.float32)
        pd = down.init(jax.random.PRNGKey(0), x)
        y = down.apply(pd, x)
        pu = up.init(jax.random.PRNGKey(1), y)
        z = up.apply(pu, y)
        assert z.shape == x.shape


class TestARMultiConv:
    def test_heads_and_context(self):
        m = AutoRegressiveMultiConv2D(convolution_features=[8, 8],
                                      head_features=[4, 4])
        z = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 4),
                        jnp.float32)
        ctx = jnp.zeros((1, 6, 6, 8))
        params = m.init(jax.random.PRNGKey(0), z, ctx)
        mean, log_scale = m.apply(params, z, ctx)
        assert mean.shape == z.shape and log_scale.shape == z.shape


class TestMetrics:
    def test_psnr_identity(self):
        from rec_tpu.utils.metrics import psnr

        x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                        jnp.float32)
        assert float(psnr(x, x).min()) > 100
        noisy = x + 0.1
        assert 15 < float(psnr(x, noisy).mean()) < 25

    def test_msssim_sane(self):
        from rec_tpu.utils.metrics import ms_ssim, ssim

        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(1, 180, 180, 3), jnp.float32)
        assert abs(float(ssim(x, x)[0]) - 1.0) < 1e-5
        assert abs(float(ms_ssim(x, x)[0]) - 1.0) < 1e-4
        y = jnp.clip(x + 0.3 * jnp.asarray(rs.randn(1, 180, 180, 3)), 0, 1)
        v = float(ms_ssim(x, y)[0])
        assert 0.0 < v < 0.9


class TestMNISTVAE:
    def test_forward_and_vamp(self):
        from rec_tpu.models.mnist_vae import MNISTVAE, MNISTVampVAE

        x = jnp.asarray((np.random.RandomState(0).rand(4, 28, 28, 1) > 0.5),
                        jnp.float32)
        for cls, kwargs in ((MNISTVAE, {}),
                            (MNISTVampVAE, {"num_vamp_components": 16})):
            model = cls(latents=20, hidden_size=64, **kwargs)
            params = model.init(jax.random.PRNGKey(0), x,
                                jax.random.PRNGKey(1))
            out = model.apply(params, x, jax.random.PRNGKey(2))
            assert out["reconstruction"].shape == x.shape
            assert out["kl"].shape == (4,)
            assert bool(jnp.all(jnp.isfinite(out["log_likelihood"])))

    def test_mog_prior(self):
        from rec_tpu.models.mnist_vae import MNISTMoGVAE

        x = jnp.asarray((np.random.RandomState(1).rand(4, 28, 28, 1) > 0.5),
                        jnp.float32)
        model = MNISTMoGVAE(latents=20, hidden_size=64, num_components=8)
        params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        out = model.apply(params, x, jax.random.PRNGKey(2))
        assert out["reconstruction"].shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out["kl"])))
        # A wide learned mixture reduces to its components: with all locs 0
        # and unit scales the prior must equal the standard normal exactly.
        p = jax.tree_util.tree_map(lambda a: a, params)
        p["params"]["mog_loc"] = jnp.zeros_like(p["params"]["mog_loc"])
        p["params"]["mog_log_scale"] = jnp.zeros_like(
            p["params"]["mog_log_scale"])
        z = jnp.asarray(np.random.RandomState(2).randn(3, 20), jnp.float32)
        lp = model.apply(p, z, method=model.prior_log_prob)
        expected = np.sum(-0.5 * np.asarray(z) ** 2 - 0.9189385332046727,
                          axis=-1)
        np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)

    @pytest.mark.slow
    def test_snis_prior_vae(self):
        from rec_tpu.models.mnist_vae import MNISTSNISVAE

        x = jnp.asarray((np.random.RandomState(3).rand(2, 28, 28, 1) > 0.5),
                        jnp.float32)
        model = MNISTSNISVAE(latents=10, hidden_size=32, snis_K=16,
                             snis_hidden=16)
        params = model.init({"params": jax.random.PRNGKey(0),
                             "snis": jax.random.PRNGKey(1)},
                            x, jax.random.PRNGKey(2))
        out = model.apply(params, x, jax.random.PRNGKey(3),
                          rngs={"snis": jax.random.PRNGKey(4)})
        assert out["reconstruction"].shape == x.shape
        assert out["kl"].shape == (2,)
        assert bool(jnp.all(jnp.isfinite(out["kl"])))

    @pytest.mark.slow
    def test_snis(self):
        from rec_tpu.models.mnist_vae import SNISDistribution

        d = SNISDistribution(dim=2, K=32, hidden=16)
        x = jnp.asarray(np.random.RandomState(0).randn(5, 2), jnp.float32)
        params = d.init({"params": jax.random.PRNGKey(0),
                         "snis": jax.random.PRNGKey(1)}, x)
        lp = d.apply(params, x, rngs={"snis": jax.random.PRNGKey(2)})
        assert lp.shape == (5, 1)
        s = d.apply(params, jax.random.PRNGKey(3), method=d.sample)
        assert s.shape == (2,)
