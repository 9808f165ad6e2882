"""Lossy compression model interface (ref
rec/models/lossy/lossy_compression_model.py).

TPU-flavoured contract: models expose
  * ``__call__(images, key)``      — training forward (posterior sampling)
  * ``rec_forward(images, seeds)`` — forward with REC encoding per level,
    returning per-level CodedLatent index streams + the reconstruction
  * ``rec_decode(shape, latents, seeds)`` — reconstruction from indices
and the host-side helpers ``compress_to_file`` / ``decompress_from_file``
wire those through the .rec container (ref large_2_level_vae.py:406-456).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ...io import read_rec, write_rec


def compress_to_file(model, params, file_path: str, image, seed: int,
                     block_size: int, max_index: int, codec: str = "ac"):
    """REC-encode ``image`` (H, W, 3 in [0,1]) and serialize to ``file_path``.
    Returns the reconstruction (ref LossyCompressionModel.compress).
    ``codec``: .rec entropy codec ("ac" | "rans"); the file self-describes,
    so decompress_from_file needs no hint."""
    import warnings

    out = model.apply(params, image[None], seed, method=model.rec_forward)
    latents = [(np.asarray(ind), np.asarray(cnt))
               for ind, cnt in out["latents"]]
    budget = model.coder.max_partitions
    saturated = sum(int(np.sum(cnt == budget)) for _, cnt in latents)
    if saturated:
        warnings.warn(
            f"{saturated} latent block(s) hit max_partitions={budget}; the "
            "coded sample is truncated and reconstruction quality degrades "
            "— use a coder with a larger max_partitions", stacklevel=2)
    write_rec(file_path, seed=seed, image_shape=tuple(image.shape),
              block_size=block_size, max_index=max_index, latents=latents,
              codec=codec)
    return out["reconstruction"][0]


def decompress_from_file(model, params, file_path: str, max_partitions: int):
    """Inverse of compress_to_file (ref LossyCompressionModel.decompress)."""
    seed, image_shape, _, latents = read_rec(file_path,
                                             max_partitions=max_partitions)
    latents = [(jnp.asarray(ind), jnp.asarray(cnt)) for ind, cnt in latents]
    recon = model.apply(params, image_shape[:2], latents, seed,
                        method=model.rec_decode)
    return recon[0]
