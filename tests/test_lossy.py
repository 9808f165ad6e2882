"""Lossy model tests: training forward, REC compress/decompress consistency,
and .rec container round trips for the 1-, 2-, and 4-level VAEs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder
from rec_tpu.models.lossy import (Large1LevelVAE, Large2LevelVAE,
                                  Large4LevelVAE, compress_to_file,
                                  decompress_from_file)

CODER = BeamSearchCoder(kl_per_partition=3.0, n_beams=4, extra_samples=1.2,
                        block_size=256, max_partitions=8)


def _image(h=64, w=64):
    return jnp.asarray(np.random.RandomState(0).rand(1, h, w, 3), jnp.float32)


def _check_model(model, x, n_levels, tmp_path=None):
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    out = model.apply(params, x, jax.random.PRNGKey(2))
    assert out["reconstruction"].shape == x.shape
    assert len(out["kls"]) == n_levels
    assert all(bool(jnp.isfinite(k)) for k in out["kls"])

    comp = model.apply(params, x, 77, method=model.rec_forward)
    assert len(comp["latents"]) == n_levels
    recon = model.apply(params, x.shape[1:3], comp["latents"], 77,
                        method=model.rec_decode)
    np.testing.assert_allclose(np.asarray(recon),
                               np.asarray(comp["reconstruction"]),
                               rtol=1e-4, atol=1e-5)
    return params, comp


class TestLarge1LevelVAE:
    @pytest.mark.slow
    def test_end_to_end(self, tmp_path):
        model = Large1LevelVAE(num_filters=16, coder=CODER)
        x = _image(32, 32)
        params, comp = _check_model(model, x, 1)
        path = os.path.join(tmp_path, "l1.rec")
        recon = compress_to_file(model, params, path, x[0], seed=5,
                                 block_size=256, max_index=CODER.n_samples)
        recon2 = decompress_from_file(model, params, path, max_partitions=8)
        np.testing.assert_allclose(np.asarray(recon2), np.asarray(recon),
                                   rtol=1e-4, atol=1e-5)


class TestLarge2LevelVAE:
    @pytest.mark.slow
    def test_end_to_end(self, tmp_path):
        model = Large2LevelVAE(level_1_filters=12, level_2_filters=8,
                               coder=CODER)
        x = _image(64, 64)
        params, comp = _check_model(model, x, 2)
        path = os.path.join(tmp_path, "l2.rec")
        recon = compress_to_file(model, params, path, x[0], seed=9,
                                 block_size=256, max_index=CODER.n_samples)
        recon2 = decompress_from_file(model, params, path, max_partitions=8)
        np.testing.assert_allclose(np.asarray(recon2), np.asarray(recon),
                                   rtol=1e-4, atol=1e-5)


class TestLarge4LevelVAE:
    @pytest.mark.slow
    def test_end_to_end(self):
        model = Large4LevelVAE(level_1_filters=8, level_2_filters=8,
                               level_3_filters=8, level_4_filters=8,
                               coder=CODER)
        x = _image(64, 64)
        _check_model(model, x, 4)


class TestBatchedLossy:
    @pytest.mark.slow
    def test_batched_rec_forward_equals_single(self):
        """Batched lossy serving (parallel.make_batch_rec_forward) must
        produce per-image index streams equal to single-image rec_forward
        for bit-identical model stats (CPU convs are shape-stable here; on
        TPU the decode-coherence contract applies — see parallel/batch.py
        and examples/lossy/serve.py verify)."""
        from rec_tpu.parallel import (make_batch_rec_decode,
                                      make_batch_rec_forward)

        model = Large2LevelVAE(level_1_filters=8, level_2_filters=8,
                               coder=CODER)
        rs = np.random.RandomState(3)
        images = jnp.asarray(rs.rand(4, 64, 64, 3), jnp.float32)
        seeds = jnp.arange(50, 54)
        params = model.init(jax.random.PRNGKey(0), images[:1],
                            jax.random.PRNGKey(1))
        out = make_batch_rec_forward(model)(params, images, seeds)
        single = model.apply(params, images[2:3], 52,
                             method=model.rec_forward)
        for lvl in range(2):
            np.testing.assert_array_equal(
                np.asarray(out["latents"][lvl][0][2]),
                np.asarray(single["latents"][lvl][0]))
            np.testing.assert_array_equal(
                np.asarray(out["latents"][lvl][1][2]),
                np.asarray(single["latents"][lvl][1]))
        # Batched decode reproduces the batched reconstructions.
        lat = [(out["latents"][lvl][0], out["latents"][lvl][1])
               for lvl in range(2)]
        recon = make_batch_rec_decode(model, (64, 64))(params, lat, seeds)
        np.testing.assert_allclose(np.asarray(recon[:, 0]),
                                   np.asarray(out["reconstruction"][:, 0]),
                                   rtol=1e-4, atol=1e-5)


def test_saturation_warning(tmp_path):
    """compress_to_file must warn when any latent block's partition count
    hits the coder's static budget (silent truncation collapses quality)."""
    import warnings

    tiny = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                           extra_samples=1.2, block_size=256,
                           max_partitions=1)
    model = Large1LevelVAE(num_filters=16, coder=tiny)
    x = _image()
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        compress_to_file(model, params, os.path.join(tmp_path, "s.rec"),
                         x[0], seed=5, block_size=256,
                         max_index=tiny.n_samples)
    assert any("max_partitions" in str(w.message) for w in caught)
