"""Large ResNet VAE tests: forward, compress/decompress, likelihood family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder
from rec_tpu.models.large_resnet_vae import (LargeResNetVAE,
                                             LargeResNetVAEConfig)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = LargeResNetVAEConfig(first_deterministic_filters=12,
                               second_deterministic_filters=12,
                               first_stochastic_filters=8,
                               second_stochastic_filters=4)
    coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                            extra_samples=1.2, block_size=128,
                            max_partitions=8)
    model = LargeResNetVAE(cfg=cfg, coder=coder)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    return model, params, x


def test_forward(model_and_params):
    model, params, x = model_and_params
    out = model.apply(params, x, jax.random.PRNGKey(2))
    assert out["reconstruction"].shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out["log_likelihood"])))
    assert len(out["analytic_kl"]) == 2


def test_compress_decompress(model_and_params):
    model, params, x = model_and_params
    comp = model.apply(params, x, 55, method=model.compress)
    recon = model.apply(params, (64, 64), comp["latents"], 55,
                        method=model.decompress)
    np.testing.assert_allclose(np.asarray(recon),
                               np.asarray(comp["reconstruction"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("likelihood", ["gaussian", "laplace", "ms-ssim",
                                        "ms-ssim-laplace"])
@pytest.mark.slow
def test_likelihood_family(likelihood):
    cfg = LargeResNetVAEConfig(first_deterministic_filters=8,
                               second_deterministic_filters=8,
                               first_stochastic_filters=4,
                               second_stochastic_filters=4,
                               likelihood=likelihood, use_sig_convs=False,
                               use_gdn=False)
    model = LargeResNetVAE(cfg=cfg, coder=None)
    # ms-ssim needs >= 176px for 5 scales of 11x11 windows
    size = 192 if "ms-ssim" in likelihood else 64
    x = jnp.asarray(np.random.RandomState(1).rand(1, size, size, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    out = model.apply(params, x, jax.random.PRNGKey(2))
    assert bool(jnp.all(jnp.isfinite(out["log_likelihood"])))


@pytest.mark.parametrize("likelihood", ["gaussian", "laplace"])
def test_likelihood_scale_not_runaway(likelihood):
    """The laplace/gaussian log-densities must include their normalizer:
    without it -log_lik is monotonically decreasing in the learned scale,
    so training pushes log_scale to +inf and the reconstruction term
    silently vanishes (this collapsed the round-3 hopper512 model at
    log_scale=4.19).  With the normalizer, LL(scale) has an interior
    maximum: a huge scale must be WORSE than a moderate one."""
    cfg = LargeResNetVAEConfig(first_deterministic_filters=8,
                               second_deterministic_filters=8,
                               first_stochastic_filters=4,
                               second_stochastic_filters=4,
                               likelihood=likelihood, use_sig_convs=False,
                               use_gdn=False)
    model = LargeResNetVAE(cfg=cfg, coder=None)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    def ll_at(log_scale):
        import flax

        p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") \
            else dict(params)
        p = jax.tree_util.tree_map(lambda v: v, params)
        p["params"]["likelihood_log_scale"] = jnp.asarray(log_scale)
        out = model.apply(p, x, jax.random.PRNGKey(2))
        return float(out["log_likelihood"][0])

    # Past the interior optimum (laplace b* ~ mean|255 dx|, log b* ~ 4.5
    # on untrained residuals; gaussian log-var* ~ 9), increasing the scale
    # must DECREASE the log-likelihood; without the normalizer LL is
    # monotonically increasing in scale and training runs away.
    moderate = ll_at(10.0)
    runaway = ll_at(16.0)
    assert moderate > runaway, (moderate, runaway)
