"""Residual entropy coding: true lossless files.

The reference's "lossless" evaluation counts the image-residual bits
implicitly via the discretized-logistic likelihood and only stores latent
indices in the .rec file (SURVEY.md §0; ref compression_performance.py).
This module actually codes the residual so the file alone reproduces the
image bit-exactly:

  * the decoder's reconstruction mu (from the REC-decoded latents) defines
    p(x | mu) = DiscretizedLogistic(mu, s) with the model's single global
    scale s (ref resnet_vae.py likelihood_log_scale);
  * the residual symbol r = (x_int - mu_int) mod 256 is therefore
    ~ discretized logistic centred at 0 with scale s — ONE shared histogram,
    built analytically from the logistic CDF, so nothing extra is
    transmitted (the decoder knows s from the model);
  * residuals stream through the native arithmetic coder.

The encoder must score residuals against the exact reconstruction the
decoder will compute — callers pass the decode-replay reconstruction
(encoder-embeds-decoder, as with the latent sample).

CONTRACT: the reconstruction entering ``encode_residual`` and
``decode_residual`` must come from the SAME compiled program — the canonical
single-image ``model.decompress``.  Different program shapes (e.g. a vmapped
batch decode) produce ULP-level reconstruction differences, which flip
quantization bins at boundaries and corrupt the residual.  Batch-encode
pipelines therefore run the canonical decode replay per image for residual
scoring even when the index search was batched.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .arithmetic import ArithmeticCoder

ALPHABET = 257  # EOF=0 + 256 shifted residual symbols


def quantize(image01: np.ndarray) -> np.ndarray:
    """[0,1) float image -> int levels 0..255 (binsize 1/256, matching the
    likelihood's floor discretization)."""
    return np.clip(np.floor(np.asarray(image01) * 256.0), 0, 255).astype(
        np.int32)


def residual_histogram(scale: float, total: int = 1 << 16) -> np.ndarray:
    """Counts over (EOF, r=-128..127 shifted to 1..256) from the logistic CDF
    at integer offsets; floor of 1 count keeps every symbol codable."""
    binsize = 1.0 / 256.0
    r = np.arange(-128, 128, dtype=np.float64)

    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    lo = (r - 0.5) * binsize / scale
    hi = (r + 0.5) * binsize / scale
    p = sigmoid(hi) - sigmoid(lo)
    p /= p.sum()
    counts = np.maximum((p * total).astype(np.int64), 1)
    return np.concatenate([[1], counts])  # EOF prepended


def encode_residual(image01: np.ndarray, recon01: np.ndarray,
                    scale: float) -> Tuple[bytes, int]:
    """Returns (packed stream, pixel count)."""
    x = quantize(image01)
    mu = quantize(recon01)
    r = (x - mu) % 256                       # 0..255
    symbols = ((r + 128) % 256) + 1          # center, shift past EOF
    msg = np.concatenate([symbols.reshape(-1), [0]]).astype(np.int32)
    ac = ArithmeticCoder(residual_histogram(scale))
    data, _ = ac.encode(msg)
    return data, int(x.size)


def decode_residual(data: bytes, recon01: np.ndarray, scale: float
                    ) -> np.ndarray:
    """Returns the exact original quantized image as [0,1) floats
    (level + 0.5)/256 — the canonical dequantization."""
    mu = quantize(recon01)
    ac = ArithmeticCoder(residual_histogram(scale))
    msg = ac.decode(data, len(data) * 8, max_symbols=mu.size + 2)
    symbols = msg[:-1]
    assert symbols.size == mu.size, "residual stream length mismatch"
    r = (symbols - 1 - 128) % 256
    x = (mu.reshape(-1) + r) % 256
    return ((x.reshape(mu.shape).astype(np.float32)) + 0.5) / 256.0
