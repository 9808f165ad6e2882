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
