"""True-lossless end-to-end: image -> .rec (latent indices + residual
stream) -> exact 8-bit pixel recovery from the file alone.

This is the automated compress->file->decompress->bit-identical test the
reference lacks (SURVEY.md §4 implications)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_tpu.coding import BeamSearchCoder
from rec_tpu.io import read_rec, write_rec
from rec_tpu.io.residual import (decode_residual, encode_residual,
                                 quantize, residual_histogram)
from rec_tpu.models.resnet_vae import BidirectionalResNetVAE, ResNetVAEConfig


class TestResidualCoding:
    def test_histogram_is_valid(self):
        h = residual_histogram(0.05)
        assert h.shape == (257,) and h.min() >= 1

    def test_roundtrip_exact(self):
        rs = np.random.RandomState(0)
        x = rs.randint(0, 256, size=(16, 16, 3)).astype(np.float32) / 255.0
        recon = np.clip(x + 0.05 * rs.randn(16, 16, 3), 1e-3, 1 - 1e-3)
        data, n = encode_residual(x, recon, scale=0.05)
        dec = decode_residual(data, recon, scale=0.05)
        np.testing.assert_array_equal(quantize(dec), quantize(x))

    def test_good_recon_compresses_well(self):
        """Residual bits shrink with reconstruction quality."""
        rs = np.random.RandomState(1)
        x = rs.rand(32, 32, 3).astype(np.float32)
        good = np.clip(x + 0.002 * rs.randn(32, 32, 3), 0, 1 - 1e-6)
        bad = rs.rand(32, 32, 3).astype(np.float32)
        d_good, _ = encode_residual(x, good, scale=0.01)
        d_bad, _ = encode_residual(x, bad, scale=0.01)
        assert len(d_good) < len(d_bad) * 0.7

    def test_adaptive_beats_single_class_on_heteroscedastic(self):
        """A residual field whose magnitude tracks the reconstruction's
        local activity (the big-image regime, VERDICT r4 weak #3) must
        code smaller with K classes than with one."""
        rs = np.random.RandomState(3)
        H = W = 48
        # Recon: half flat, half textured; residual noise follows texture.
        recon = np.full((H, W, 3), 0.5, np.float32)
        recon[:, W // 2:] += 0.25 * rs.randn(H, W // 2, 3).astype(np.float32)
        recon = np.clip(recon, 0.0, 1.0 - 1e-6)
        sigma = np.where(np.arange(W)[None, :, None] < W // 2, 0.002, 0.06)
        x = np.clip(recon + sigma * rs.randn(H, W, 3), 0.0, 1.0 - 1e-6
                    ).astype(np.float32)
        d_16, _ = encode_residual(x, recon, n_classes=16)
        d_1, _ = encode_residual(x, recon, n_classes=1)
        np.testing.assert_array_equal(
            quantize(decode_residual(d_16, recon)), quantize(x))
        assert len(d_16) < len(d_1) * 0.9

    def test_classed_stream_native_matches_python(self):
        """v3's single classed stream: the native C++ coder and the pure-
        Python twin must produce identical bytes and decode each other
        (differential test, SURVEY.md §4 style)."""
        from rec_tpu.io.arithmetic import (ArithmeticCoder, _load_native,
                                           _py_decode_classes,
                                           _py_encode_classes)

        rs = np.random.RandomState(7)
        counts = np.stack([residual_histogram(s)[1:]
                           for s in (0.002, 0.02, 0.2)])
        msg = rs.randint(0, 256, size=500).astype(np.int32)
        cls = rs.randint(0, 3, size=500).astype(np.int32)
        data_n, bits_n = ArithmeticCoder.encode_classes(counts, msg, cls)
        data_p, bits_p = _py_encode_classes(counts, msg, cls, 32)
        if _load_native() is not None:
            assert (data_n, bits_n) == (data_p, bits_p)
        out_n = ArithmeticCoder.decode_classes(counts, data_p, bits_p, cls)
        out_p = _py_decode_classes(counts, data_n, bits_n, cls, 32)
        np.testing.assert_array_equal(out_n, msg)
        np.testing.assert_array_equal(out_p, msg)

    def test_v2_payload_still_decodes(self):
        """Round-5-interim v2 payloads (per-class streams + length table)
        must keep decoding after the v3 switch."""
        import struct

        from rec_tpu.io.arithmetic import ArithmeticCoder
        from rec_tpu.io.residual import _class_map

        rs = np.random.RandomState(9)
        x = rs.rand(24, 24, 3).astype(np.float32)
        recon = np.clip(x + 0.01 * rs.randn(24, 24, 3), 0, 1 - 1e-6
                        ).astype(np.float32)
        xi, mu = quantize(x), quantize(recon)
        centred = (((xi - mu) % 256).reshape(-1) + 128) % 256 - 128
        K = 2
        cls = _class_map(mu, K)
        scales, streams = [], []
        for k in range(K):
            rk = centred[cls == k]
            scales.append(0.01 * (k + 1))
            msg = np.concatenate([rk + 128 + 1, [0]]).astype(np.int32)
            data, _ = ArithmeticCoder(residual_histogram(scales[k])).encode(
                msg)
            streams.append(data)
        payload = struct.pack("<BB", 2, K) + struct.pack(f"<{K}f", *scales) \
            + struct.pack(f"<{K}I", *[len(s) for s in streams]) \
            + b"".join(streams)
        out01 = decode_residual(payload, recon)
        np.testing.assert_array_equal(quantize(out01), quantize(x))

    def test_legacy_v1_payload_reads_with_warning(self):
        """Pre-round-5 files (container tag "R", global-scale payload) must
        still decode — with a warning naming the replay-version caveat
        (ADVICE r4 #4)."""
        import struct
        import warnings

        from rec_tpu.io import ResidualSection
        from rec_tpu.io.arithmetic import ArithmeticCoder

        rs = np.random.RandomState(4)
        x = rs.rand(8, 8, 3).astype(np.float32)
        recon = np.clip(x + 0.01 * rs.randn(8, 8, 3), 0, 1 - 1e-6
                        ).astype(np.float32)
        # Hand-write a v1 payload the way round 3/4 did.
        xi, mu = quantize(x), quantize(recon)
        r = (xi - mu) % 256
        symbols = ((r + 128) % 256) + 1
        msg = np.concatenate([symbols.reshape(-1), [0]]).astype(np.int32)
        data, _ = ArithmeticCoder(residual_histogram(0.05)).encode(msg)
        with pytest.warns(UserWarning, match="legacy"):
            out01 = decode_residual(ResidualSection("R", data), recon,
                                    scale=0.05)
        np.testing.assert_array_equal(quantize(out01), quantize(x))


class TestLosslessPipeline:
    @pytest.mark.slow
    def test_file_alone_recovers_pixels(self, tmp_path):
        cfg = ResNetVAEConfig(num_res_blocks=2, deterministic_filters=16,
                              stochastic_filters=4)
        coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                                extra_samples=1.2, block_size=128,
                                max_partitions=12)
        model = BidirectionalResNetVAE(cfg=cfg, coder=coder)
        rs = np.random.RandomState(2)
        u8 = rs.randint(0, 256, size=(16, 16, 3))
        x01 = u8.astype(np.float32) / 255.0
        x = jnp.asarray(x01[None] - 0.5, jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

        # --- encoder ---
        comp = model.apply(params, x, 99, method=model.compress)
        # Encoder embeds decoder: score the residual against the decode
        # replay's reconstruction.
        dec_recon = model.apply(params, (16, 16), comp["indices"],
                                comp["counts"], 99, method=model.decompress)
        scale = float(jnp.exp(params["params"]["likelihood_log_scale"]))
        residual, _ = encode_residual(x01, np.asarray(dec_recon[0]), scale)
        latents = [(np.asarray(comp["indices"][i]),
                    np.asarray(comp["counts"][i])) for i in range(2)]
        path = os.path.join(tmp_path, "lossless.rec")
        write_rec(path, seed=99, image_shape=(16, 16, 3), block_size=128,
                  max_index=coder.n_samples, latents=latents,
                  residual=residual)

        # --- decoder: file only ---
        seed, shape, _, latents2, residual2 = read_rec(
            path, max_partitions=12, with_residual=True)
        ind = jnp.stack([jnp.asarray(i) for i, _ in latents2])
        cnt = jnp.stack([jnp.asarray(c) for _, c in latents2])
        recon2 = model.apply(params, shape[:2], ind, cnt, seed,
                             method=model.decompress)
        out01 = decode_residual(residual2, np.asarray(recon2[0]), scale)

        # Exact 8-bit recovery
        np.testing.assert_array_equal(quantize(out01), quantize(x01))
        np.testing.assert_array_equal(
            np.floor(out01 * 256).astype(np.int32), u8)
