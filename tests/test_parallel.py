"""Multi-chip determinism tests on the virtual 8-device CPU mesh: the coded
indices and samples must be identical regardless of sharding (SURVEY.md §4's
added multi-chip test requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder, GaussianParams
from rec_tpu.parallel import (make_mesh, sharded_decode_blocks,
                              sharded_encode_blocks)


@pytest.fixture(scope="module")
def latent():
    rs = np.random.RandomState(0)
    shape = (10, 10, 8)
    target = GaussianParams(
        jnp.asarray(0.3 * rs.randn(*shape), jnp.float32),
        jnp.asarray(np.exp(0.2 * rs.randn(*shape)), jnp.float32))
    coding = GaussianParams(jnp.zeros(shape, jnp.float32),
                            jnp.ones(shape, jnp.float32))
    return target, coding


CODER = BeamSearchCoder(kl_per_partition=3.0, n_beams=4, extra_samples=1.2,
                        block_size=64, max_partitions=12)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_encode_matches_single_chip(latent):
    target, coding = latent
    mesh = make_mesh()
    ind_s, cnt_s, sample_s = sharded_encode_blocks(CODER, target, coding,
                                                   42, mesh)
    ref = CODER.encode(target, coding, 42)
    np.testing.assert_array_equal(np.asarray(ind_s), np.asarray(ref.indices))
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(ref.counts))
    np.testing.assert_array_equal(np.asarray(sample_s),
                                  np.asarray(ref.sample))


def test_sharded_encode_single_decode(latent):
    """Encode on 8 chips, decode on 1 — bit-exact (the sharding-coherence
    keystone, SURVEY.md §2.8)."""
    target, coding = latent
    mesh = make_mesh()
    ind, cnt, sample = sharded_encode_blocks(CODER, target, coding, 7, mesh)
    decoded = CODER.decode(coding, ind, cnt, 7)
    np.testing.assert_array_equal(np.asarray(sample), np.asarray(decoded))


def test_sharded_decode_matches(latent):
    target, coding = latent
    mesh = make_mesh()
    ref = CODER.encode(target, coding, 3)
    decoded = sharded_decode_blocks(CODER, coding, ref.indices, ref.counts,
                                    3, mesh)
    np.testing.assert_array_equal(np.asarray(decoded), np.asarray(ref.sample))


def test_mesh_subsets(latent):
    """Same indices on 2-device and 8-device meshes."""
    target, coding = latent
    i2, c2, s2 = sharded_encode_blocks(CODER, target, coding, 9,
                                       make_mesh(2))
    i8, c8, s8 = sharded_encode_blocks(CODER, target, coding, 9,
                                       make_mesh(8))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i8))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s8))


class TestBatchCompress:
    @pytest.mark.slow
    def test_batched_equals_single(self):
        """vmapped multi-image compress must produce exactly the indices and
        samples of per-image encodes (per-image seed contract)."""
        from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                               ResNetVAEConfig)
        from rec_tpu.parallel.batch import (make_batch_compress,
                                            make_batch_decompress,
                                            shard_images)

        cfg = ResNetVAEConfig(num_res_blocks=2, deterministic_filters=12,
                              stochastic_filters=4)
        coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                                extra_samples=1.2, block_size=128,
                                max_partitions=10)
        model = BidirectionalResNetVAE(cfg=cfg, coder=coder)
        rs = np.random.RandomState(0)
        images = jnp.asarray(rs.rand(8, 16, 16, 3) - 0.5, jnp.float32)
        seeds = jnp.arange(100, 108)
        params = model.init(jax.random.PRNGKey(0), images[:1],
                            jax.random.PRNGKey(1))

        mesh = make_mesh()
        sharded_images, sharded_seeds = shard_images(images, seeds, mesh)
        batch_compress = make_batch_compress(model)
        out = batch_compress(params, sharded_images, sharded_seeds)

        # Per-image reference encode: transmitted data (indices/counts) must
        # be EXACTLY what a single-image encode produces; reconstructions may
        # differ by ULPs between the vmapped and single programs (which is
        # why residual coding pins the canonical single-image decode program,
        # see rec_tpu/io/residual.py).
        single = model.apply(params, images[3:4], 103, method=model.compress)
        np.testing.assert_array_equal(np.asarray(out["indices"][3]),
                                      np.asarray(single["indices"]))
        np.testing.assert_array_equal(np.asarray(out["counts"][3]),
                                      np.asarray(single["counts"]))
        np.testing.assert_allclose(np.asarray(out["reconstruction"][3]),
                                   np.asarray(single["reconstruction"]),
                                   rtol=1e-4, atol=1e-5)

        # Batched decode matches too
        batch_decompress = make_batch_decompress(model, (16, 16))
        recon = batch_decompress(params, out["indices"], out["counts"], seeds)
        np.testing.assert_allclose(np.asarray(recon[:, 0]),
                                   np.asarray(out["reconstruction"][:, 0]),
                                   rtol=1e-4, atol=1e-5)
