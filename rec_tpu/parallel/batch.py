"""Batched / sharded whole-model compression: many images per program.

The per-image compress is a long chain of small sequential steps (res blocks
x KL partitions); vmapping images through the SAME program vectorizes every
step across the batch, and sharding the image axis over the mesh scales it
across chips with zero collectives (images are independent).  Decode remains
per-image reproducible: image i uses seed seeds[i], exactly as if encoded
alone — verified by tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from .mesh import DATA_AXIS, data_axis_sharding


def make_batch_compress(model):
    """Returns jitted (params, images (B,H,W,C), seeds (B,)) -> stacked
    compress outputs (leading axis B).

    The whole-partition mega-kernel is single-image-only on real TPU: a
    vmapped ``pallas_call`` batches its SMEM count/key specs into
    (batch, N) blocks that Mosaic's tiling rules reject (interpret mode
    accepts them, so only hardware lowering catches it).  The batched
    path therefore always uses the XLA scan encode — whose per-step work
    vectorizes across the batch anyway — by cloning the model with the
    kernel disabled.  Streams are identical on both paths, so files stay
    decode-compatible either way."""
    import dataclasses

    coder = getattr(model, "coder", None)
    if coder is not None and getattr(coder, "use_fused_kernel", False):
        model = model.clone(
            coder=dataclasses.replace(coder, use_fused_kernel=False))

    def one(params, image, seed):
        return model.apply(params, image[None], seed, method=model.compress)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))


def make_batch_decompress(model, shape):
    def one(params, indices, counts, seed):
        return model.apply(params, shape, indices, counts, seed,
                           method=model.decompress)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))


def shard_images(images, seeds, mesh):
    """Place the image batch over the mesh's data axis (pad batch to a mesh
    multiple upstream)."""
    return (jax.device_put(images, data_axis_sharding(mesh, images.ndim)),
            jax.device_put(seeds, data_axis_sharding(mesh, 1)))
