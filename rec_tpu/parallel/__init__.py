"""Multi-chip parallelism (SURVEY.md §2.9 TPU-native equivalents).

The reference is single-process/single-device; the models are small, so the
right distribution strategy on TPU is pure data parallelism over ICI/DCN:
  * training: batch sharded over the mesh, params replicated, gradients
    all-reduced by XLA (jit + NamedSharding);
  * encoding: images and latent blocks are embarrassingly parallel — the
    block axis of the vmapped codec shards across chips with zero
    collectives; index streams gather to host for serialization.
"""

from .batch import (make_batch_compress, make_batch_decompress,
                    make_batch_rec_decode, make_batch_rec_forward,
                    shard_images)
from .codec import sharded_decode_blocks, sharded_encode_blocks
from .mesh import data_axis_sharding, make_mesh, replicated_sharding

__all__ = ["make_mesh", "data_axis_sharding", "replicated_sharding",
           "sharded_encode_blocks", "sharded_decode_blocks",
           "make_batch_compress", "make_batch_decompress",
           "make_batch_rec_forward", "make_batch_rec_decode",
           "shard_images"]
