"""Sharded REC encode/decode: latent blocks data-parallel across chips.

Blocks are independent after the split (partition.py), so the per-block codec
shards across the mesh with zero collectives: each chip encodes its shard of
blocks, and the (tiny) index streams gather to host 0 for arithmetic coding
in deterministic block order.  The block axis is padded to a mesh multiple
with target==coder dummy blocks (coding no-ops, dropped after).

This is the TPU-native replacement for the reference's serial Python loop
over blocks (ref rec/coding/coder.py:435-452) at multi-chip scale.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..coding import rng
from ..coding.gauss import GaussianParams
from ..coding.partition import (merge, plan_split, split_coder, split_pair,
                                split_permutation)
from .mesh import DATA_AXIS


def _pad_blocks(g: GaussianParams, n_pad: int, is_target: bool
                ) -> GaussianParams:
    if n_pad == 0:
        return g
    D = g.loc.shape[-1]
    pad_loc = jnp.zeros((n_pad, D), g.loc.dtype)
    pad_scale = jnp.ones((n_pad, D), g.scale.dtype)
    return GaussianParams(jnp.concatenate([g.loc, pad_loc]),
                          jnp.concatenate([g.scale, pad_scale]))


@partial(jax.jit, static_argnums=(0, 4))
def _encode_padded(coder, target, coding, seed, num_real):
    root = rng.root_key(seed)
    nb = target.loc.shape[0]
    bkeys = jax.vmap(lambda b: rng.block_key(root, b))(jnp.arange(nb))
    coded = coder._encode_blocks(target, coding, bkeys, coder._ratios())
    samples = coder._decode_blocks(coding, coded.indices, coded.count,
                                   bkeys, coder._ratios())
    return coded.indices, coded.count, samples


def sharded_encode_blocks(coder, target: GaussianParams,
                          coding: GaussianParams, seed, mesh: Mesh
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Encode an arbitrary-shape latent with blocks sharded over ``mesh``.

    Returns (indices (nb, P), counts (nb,), sample (latent shape)) with the
    same bit-exact semantics as ``coder.encode`` on one chip — the split,
    per-block keys, and streams are identical; only placement differs.
    """
    shape = target.loc.shape
    plan = plan_split(int(target.loc.size), coder.block_size)
    root = rng.root_key(seed)
    perm = split_permutation(root, plan)
    t, c = split_pair(target, coding, plan, perm)

    n_dev = mesh.devices.size
    n_pad = (-plan.num_blocks) % n_dev
    t = _pad_blocks(t, n_pad, True)
    c = _pad_blocks(c, n_pad, False)

    block_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS, None))
    t = jax.device_put(t, block_sharding)
    c = jax.device_put(c, block_sharding)

    indices, counts, samples = _encode_padded(coder, t, c, seed,
                                              plan.num_blocks)
    nb = plan.num_blocks
    sample = merge(samples[:nb], shape, plan, perm)
    return indices[:nb], counts[:nb], sample


def sharded_decode_blocks(coder, coding: GaussianParams, indices, counts,
                          seed, mesh: Mesh) -> jnp.ndarray:
    """Decode with blocks sharded over ``mesh`` (bit-exact vs 1-chip)."""
    shape = coding.loc.shape
    plan = plan_split(int(coding.loc.size), coder.block_size)
    root = rng.root_key(seed)
    perm = split_permutation(root, plan)
    c = split_coder(coding, plan, perm)

    n_dev = mesh.devices.size
    n_pad = (-plan.num_blocks) % n_dev
    c = _pad_blocks(c, n_pad, False)
    indices = jnp.concatenate(
        [indices, jnp.zeros((n_pad,) + indices.shape[1:], indices.dtype)])
    counts = jnp.concatenate([counts, jnp.ones((n_pad,), counts.dtype)])

    block_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS, None))
    c = jax.device_put(c, block_sharding)
    indices = jax.device_put(indices, block_sharding)
    counts = jax.device_put(counts, NamedSharding(mesh,
                                                  PartitionSpec(DATA_AXIS)))

    samples = _decode_padded(coder, c, indices, counts, seed)
    return merge(samples[: plan.num_blocks], shape, plan, perm)


@partial(jax.jit, static_argnums=0)
def _decode_padded(coder, coding, indices, counts, seed):
    root = rng.root_key(seed)
    nb = coding.loc.shape[0]
    bkeys = jax.vmap(lambda b: rng.block_key(root, b))(jnp.arange(nb))
    return coder._decode_blocks(coding, indices, counts, bkeys,
                                coder._ratios())
