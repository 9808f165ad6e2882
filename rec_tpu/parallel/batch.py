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

    The whole-partition mega-kernel stays fused under this vmap: its custom
    batching rule (ops/mega_beam.py) flattens the (image, block) axes into
    the kernel's block-grid axis, so one pallas_call encodes the whole
    batch — no vmapped SMEM specs (which Mosaic rejects on real TPU).

    Stream contract, stated precisely: image i is keyed by seeds[i] exactly
    as if encoded alone, and the coder-level search is bit-identical for
    bit-identical (posterior, prior) inputs (tests/test_parallel.py,
    tests/test_ops.py).  On real TPU the MODEL's conv stats differ between
    the batch-B and batch-1 programs (XLA accumulates f32 convs differently
    per shape, ~1e-4), so a rare score tie can select a different — equally
    valid — index chain (measured: h32 trained model, 4-image batch,
    groups 0-19 of 24 bit-identical, first flip at group 20).  What IS
    guaranteed is decode coherence: the transmitted (indices, counts)
    replay bit-exactly through the canonical single-image decoder (the
    replay is program-order-invariant by construction), and true-lossless
    residuals are scored against that canonical replay
    (io/residual.py contract; verified end-to-end by serve.py --verify)."""

    def one(params, image, seed):
        return model.apply(params, image[None], seed, method=model.compress)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))


def make_batch_decompress(model, shape):
    def one(params, indices, counts, seed):
        return model.apply(params, shape, indices, counts, seed,
                           method=model.decompress)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))


def make_batch_rec_forward(model):
    """Lossy analogue of ``make_batch_compress``: jitted vmap of a
    Large{1,2,4}LevelVAE's ``rec_forward`` over (images (B,H,W,C),
    seeds (B,)).  The per-level coder.encode calls inside ride the same
    mega-kernel batching rule, so the whole batch's beam search runs as
    flattened kernel blocks.  Stream contract as make_batch_compress:
    per-image seeds, decode-coherent via the canonical single-image
    ``rec_decode``."""

    def one(params, image, seed):
        return model.apply(params, image[None], seed,
                           method=model.rec_forward)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))


def make_batch_rec_decode(model, shape):
    """Batched lossy decode: vmapped ``rec_decode`` over stacked per-level
    (indices, counts) pytrees and per-image seeds."""

    def one(params, latents, seed):
        return model.apply(params, shape, latents, seed,
                           method=model.rec_decode)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))


def shard_images(images, seeds, mesh):
    """Place the image batch over the mesh's data axis (pad batch to a mesh
    multiple upstream)."""
    return (jax.device_put(images, data_axis_sharding(mesh, images.ndim)),
            jax.device_put(seeds, data_axis_sharding(mesh, 1)))
