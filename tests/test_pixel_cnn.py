"""PixelCNN tests: autoregressive property + sampling + likelihood."""

import jax
import jax.numpy as jnp
import numpy as np

from rec_tpu.models.pixel_cnn import PixelCNN


def test_log_likelihood_and_shapes():
    # AR masks require filter counts divisible by the channel count
    # (ref reparameterized_convolutions.py:28).
    model = PixelCNN(filters=18, num_residual_blocks=2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    loc, log_scale = model.apply(params, x)
    assert loc.shape == x.shape and log_scale.shape == x.shape
    ll = model.apply(params, x, method=model.log_likelihood)
    assert ll.shape == (2,) and bool(jnp.all(jnp.isfinite(ll)))


def test_autoregressive_property():
    """Output at a pixel must not depend on that pixel's own input (mask "a"
    first layer) — the property the reference never got to test."""
    model = PixelCNN(filters=16, num_residual_blocks=1)
    x = jnp.zeros((1, 6, 6, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    loc0, _ = model.apply(params, x)
    x2 = x.at[0, 3, 3, 0].set(1.0)
    loc1, _ = model.apply(params, x2)
    delta = np.asarray(jnp.abs(loc1 - loc0))[0, :, :, 0]
    assert delta[3, 3] == 0.0  # self
    assert delta[4:].max() == 0.0  # AR order: rows below already generated
    assert delta[3, 4:].max() == 0.0


def test_sampling():
    model = PixelCNN(filters=8, num_residual_blocks=1)
    x = jnp.zeros((1, 6, 6, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    img = model.apply(params, jax.random.PRNGKey(1), (6, 6, 1),
                      method=model.sample)
    assert img.shape == (6, 6, 1)
    assert float(img.min()) >= -0.5 and float(img.max()) <= 0.5


def test_channel_autoregressive_property():
    """Multi-channel: channel k's output must not depend on the pixel's own
    channels >= k (review finding: unmasked heads leaked same-pixel
    channels into their own densities)."""
    model = PixelCNN(filters=12, num_residual_blocks=1)
    x = jnp.zeros((1, 5, 5, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    loc0, _ = model.apply(params, x)
    # Perturb channel 1 of pixel (2,2): outputs for channels 0 and 1 at that
    # pixel must be unchanged; channel 2 may change.
    x2 = x.at[0, 2, 2, 1].set(1.0)
    loc1, _ = model.apply(params, x2)
    delta = np.asarray(jnp.abs(loc1 - loc0))[0, 2, 2]
    assert delta[0] == 0.0 and delta[1] == 0.0
    # Perturbing channel 0 must leave channel 0's own density unchanged.
    x3 = x.at[0, 2, 2, 0].set(1.0)
    loc2, _ = model.apply(params, x3)
    assert np.asarray(jnp.abs(loc2 - loc0))[0, 2, 2, 0] == 0.0
