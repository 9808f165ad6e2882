"""RVAE model tests: forward pass, compress/decompress consistency, and the
latent bit-exactness invariant through the full model stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder
from rec_tpu.models.resnet_vae import BidirectionalResNetVAE, ResNetVAEConfig


def _tiny_model(num_blocks=2, use_iaf=False):
    cfg = ResNetVAEConfig(num_res_blocks=num_blocks,
                          deterministic_filters=16,
                          stochastic_filters=4,
                          use_iaf=use_iaf)
    coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                            extra_samples=1.2, block_size=128,
                            max_partitions=12)
    return BidirectionalResNetVAE(cfg=cfg, coder=coder)


@pytest.fixture(scope="module")
def model_and_params():
    model = _tiny_model()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    return model, params, x


class TestForward:
    def test_shapes_and_finiteness(self, model_and_params):
        model, params, x = model_and_params
        out = model.apply(params, x, jax.random.PRNGKey(2))
        assert out["reconstruction"].shape == x.shape
        assert out["log_likelihood"].shape == (2,)
        assert out["kld_channelwise"].shape == (2, 4)  # (blocks, channels)
        assert out["analytic_kl"].shape == (2, 2)
        for v in jax.tree_util.tree_leaves(out):
            assert bool(jnp.all(jnp.isfinite(v)))

    def test_reconstruction_range(self, model_and_params):
        model, params, x = model_and_params
        out = model.apply(params, x, jax.random.PRNGKey(2))
        r = out["reconstruction"]
        assert float(r.min()) >= 1.0 / 512.0 - 1e-6
        assert float(r.max()) <= 1.0 - 1.0 / 512.0 + 1e-6

    @pytest.mark.slow
    def test_iaf_forward(self):
        model = _tiny_model(use_iaf=True)
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        out = model.apply(params, x, jax.random.PRNGKey(2))
        assert bool(jnp.all(jnp.isfinite(out["empirical_kld"])))

    def test_grads_flow(self, model_and_params):
        model, params, x = model_and_params

        def loss_fn(p):
            out = model.apply(p, x, jax.random.PRNGKey(3))
            return (-jnp.mean(out["log_likelihood"])
                    + jnp.sum(out["kld_channelwise"]))

        grads = jax.grad(loss_fn)(params)
        norms = [float(jnp.sum(jnp.square(g)))
                 for g in jax.tree_util.tree_leaves(grads)]
        assert all(np.isfinite(norms))
        assert sum(n > 0 for n in norms) > len(norms) * 0.5


class TestCompression:
    def test_compress_decompress_consistent(self, model_and_params):
        model, params, x = model_and_params
        image = x[:1]
        comp = model.apply(params, image, 1234, method=model.compress)
        assert bool(jnp.all(jnp.isfinite(comp["reconstruction"])))
        recon = model.apply(params, (16, 16), comp["indices"],
                            comp["counts"], 1234, method=model.decompress)
        # The decoder replays the identical latents; reconstructions agree
        # up to compile-level fusion differences.
        np.testing.assert_allclose(np.asarray(recon),
                                   np.asarray(comp["reconstruction"]),
                                   rtol=1e-4, atol=1e-5)

    def test_wrong_seed_differs(self, model_and_params):
        model, params, x = model_and_params
        comp = model.apply(params, x[:1], 1234, method=model.compress)
        recon_bad = model.apply(params, (16, 16), comp["indices"],
                                comp["counts"], 999, method=model.decompress)
        assert not np.allclose(np.asarray(recon_bad),
                               np.asarray(comp["reconstruction"]),
                               atol=1e-5)

    def test_container_roundtrip(self, model_and_params, tmp_path):
        import os

        from rec_tpu.io import read_rec, write_rec

        model, params, x = model_and_params
        comp = model.apply(params, x[:1], 42, method=model.compress)
        latents = [(np.asarray(comp["indices"][i]),
                    np.asarray(comp["counts"][i]))
                   for i in range(model.cfg.num_res_blocks)]
        path = os.path.join(tmp_path, "img.rec")
        write_rec(path, seed=42, image_shape=(16, 16, 3), block_size=128,
                  max_index=model.coder.n_samples, latents=latents)
        seed, shape, _, latents2 = read_rec(path, max_partitions=12)
        ind = jnp.stack([jnp.asarray(i) for i, _ in latents2])
        cnt = jnp.stack([jnp.asarray(c) for _, c in latents2])
        np.testing.assert_array_equal(np.asarray(comp["indices"]),
                                      np.asarray(ind))
        recon = model.apply(params, (16, 16), ind, cnt, seed,
                            method=model.decompress)
        np.testing.assert_allclose(np.asarray(recon),
                                   np.asarray(comp["reconstruction"]),
                                   rtol=1e-4, atol=1e-5)
