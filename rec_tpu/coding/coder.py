"""High-level coder API: arbitrary-shaped latents -> per-block index streams.

The reference's ``Coder.encode`` splits a latent tensor into 1000-dim blocks
and loops over them in Python (ref coder.py:412-491).  Here the split pads to
equal-size blocks (coding no-ops, see partition.py) and the per-block codec is
``vmap``-ed — every block encodes in parallel on one chip, and the block axis
is the data-parallel axis for multi-chip sharding (rec_tpu/parallel/).

Two coder families, mirroring ref rec/coding/__init__.py:
  * ``GaussianCoder``  — KL-partitioned aux chain + importance sampler
  * ``BeamSearchCoder``— the paper's production coder (B beams)
Both expose encode / decode over GaussianParams of any shape and return
``CodedLatent`` (indices + counts + the bit-exactly reproducible sample).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import beam_search, importance, rng
from .gauss import GaussianParams
from .partition import (block_kl, merge, plan_split, split_coder,
                        split_pair, split_permutation)


class CodedLatent(NamedTuple):
    indices: jnp.ndarray  # (num_blocks, max_partitions) int32
    counts: jnp.ndarray   # (num_blocks,) int32 — partitions per block
    sample: jnp.ndarray   # original latent shape


class _BlockCoder:
    """Shared split/vmap plumbing; subclasses provide per-block encode/decode."""

    block_size: Optional[int]
    max_partitions: int
    kl_per_partition: float

    # -- per-block primitives (implemented by subclasses) ---------------
    def _encode_block(self, target, coder, bkey, ratios):
        raise NotImplementedError

    def _decode_block(self, coder, indices, count, bkey, ratios):
        raise NotImplementedError

    # -- batched primitives: same streams as vmap of the per-block ones,
    # but with the partition scan outermost so dead partition steps are
    # skipped via one scalar cond (beam_search/importance .encode_blocks).
    def _encode_blocks(self, targets, coders, bkeys, ratios):
        raise NotImplementedError

    def _decode_blocks(self, coders, indices, counts, bkeys, ratios):
        raise NotImplementedError

    # -- public API -----------------------------------------------------
    def required_partitions(self, target: GaussianParams,
                            coder: GaussianParams, seed: int = 0) -> int:
        """Host-side helper: max ceil(KL/Omega) over blocks, for choosing a
        large-enough static ``max_partitions`` (cf. ref coder.py:226-230)."""
        plan = plan_split(int(jnp.size(target.loc)), self.block_size)
        root = rng.root_key(seed)
        perm = split_permutation(root, plan)
        t, c = split_pair(target, coder, plan, perm)
        kls = block_kl(t, c)
        # Off-distribution inputs can drive per-dim KL to inf/NaN (scale
        # underflow, huge loc gaps); report a finite requirement so callers
        # can cap the budget and rely on count-saturation + the residual
        # stream instead of sizing a schedule from a non-finite number.
        kls = jnp.nan_to_num(kls, nan=jnp.inf, posinf=jnp.inf)
        need = float(jnp.max(jnp.ceil(kls / self.kl_per_partition)))
        return int(min(need, 2 ** 24)) or 1

    @partial(jax.jit, static_argnums=0)
    def encode(self, target: GaussianParams, coder: GaussianParams,
               seed) -> CodedLatent:
        shape = target.loc.shape
        plan = plan_split(int(jnp.size(target.loc)), self.block_size)
        root = rng.root_key(seed)
        perm = split_permutation(root, plan)
        t, c = split_pair(target, coder, plan, perm)
        bkeys = jax.vmap(lambda b: rng.block_key(root, b))(
            jnp.arange(plan.num_blocks))
        coded = self._encode_blocks(t, c, bkeys, self._ratios())
        # The encoder embeds the decoder: the reported sample is the decode
        # replay of the chosen indices, so encode().sample == decode(indices)
        # bit-for-bit by construction — immune to XLA fusing the encode- and
        # decode-side float accumulations differently (SURVEY.md §7 hard
        # part 1).  The replay costs ~1/n_beams of the encode pass.
        samples = self._decode_blocks(c, coded.indices, coded.count, bkeys,
                                      self._ratios())
        sample = merge(samples, shape, plan, perm)
        return CodedLatent(coded.indices, coded.count, sample)

    @partial(jax.jit, static_argnums=0)
    def decode(self, coder: GaussianParams, indices: jnp.ndarray,
               counts: jnp.ndarray, seed) -> jnp.ndarray:
        shape = coder.loc.shape
        plan = plan_split(int(jnp.size(coder.loc)), self.block_size)
        root = rng.root_key(seed)
        perm = split_permutation(root, plan)
        c = split_coder(coder, plan, perm)
        bkeys = jax.vmap(lambda b: rng.block_key(root, b))(
            jnp.arange(plan.num_blocks))
        samples = self._decode_blocks(c, indices, counts, bkeys,
                                      self._ratios())
        return merge(samples, shape, plan, perm)

    aux_variance_ratios = None  # subclass dataclasses may set a table

    def _ratios(self):
        if self.aux_variance_ratios is None:
            return None
        return jnp.asarray(self.aux_variance_ratios, jnp.float32)


@dataclasses.dataclass(frozen=True)
class GaussianCoder(_BlockCoder):
    """KL-partitioned Gaussian coder with an importance sampler
    (ref coder.py:174-587 + samplers.py:61-101)."""

    kl_per_partition: float = 3.0
    coding_bits: int = 12
    block_size: Optional[int] = 1000
    max_partitions: int = 24
    candidate_chunk: int = 1024
    # Proposal bit-generator ("fmix" default | "threefry"), part of the
    # stream contract like coding_bits — see rng.normal_stream.
    stream: str = "fmix"
    aux_variance_ratios: Optional[tuple] = None  # learned table, else power law

    def _cfg(self):
        return importance.ImportanceCoderConfig(
            kl_per_partition=self.kl_per_partition,
            coding_bits=self.coding_bits,
            max_partitions=self.max_partitions,
            candidate_chunk=self.candidate_chunk,
            stream=self.stream)

    def _encode_block(self, target, coder, bkey, ratios):
        return importance.encode_block(self._cfg(), target, coder, bkey, ratios)

    def _decode_block(self, coder, indices, count, bkey, ratios):
        return importance.decode_block(self._cfg(), coder, indices, count,
                                       bkey, ratios)

    def _encode_blocks(self, targets, coders, bkeys, ratios):
        return importance.encode_blocks(self._cfg(), targets, coders, bkeys,
                                        ratios)

    def _decode_blocks(self, coders, indices, counts, bkeys, ratios):
        return importance.decode_blocks(self._cfg(), coders, indices, counts,
                                        bkeys, ratios)

    def codelength_nats(self, coded: CodedLatent) -> jnp.ndarray:
        return jnp.sum(importance.codelength_nats(self._cfg(), coded.counts))


@dataclasses.dataclass(frozen=True)
class BeamSearchCoder(_BlockCoder):
    """The paper's production coder (ref beam_search_coder.py)."""

    kl_per_partition: float = 3.0
    n_beams: int = 20
    extra_samples: float = 1.2
    block_size: Optional[int] = 1000
    max_partitions: int = 24
    # Whole-partition Pallas mega-kernel on TPU — the default encode path
    # since its on-chip validation (4.8x coder-core; see
    # beam_search.BeamSearchConfig.use_fused_kernel and PERF.md round 3).
    use_fused_kernel: bool = True
    # Fast serving mode: one shared candidate pool per partition (B x less
    # candidate generation, MXU-matmul scoring) at a measured sample-quality
    # cost — see beam_search.BeamSearchConfig.shared_pool.  Part of the
    # stream contract: encode and decode must agree on it.
    shared_pool: bool = False
    # Candidate bit-generator ("fmix" default | "threefry"), part of the
    # stream contract like n_beams — see rng.normal_stream.
    stream: str = "fmix"
    aux_variance_ratios: Optional[tuple] = None

    def _cfg(self):
        return beam_search.BeamSearchConfig(
            kl_per_partition=self.kl_per_partition,
            n_beams=self.n_beams,
            extra_samples=self.extra_samples,
            max_partitions=self.max_partitions,
            use_fused_kernel=self.use_fused_kernel,
            shared_pool=self.shared_pool,
            stream=self.stream)

    @property
    def n_samples(self) -> int:
        return self._cfg().n_samples

    def _encode_block(self, target, coder, bkey, ratios):
        return beam_search.encode_block(self._cfg(), target, coder, bkey, ratios)

    def _decode_block(self, coder, indices, count, bkey, ratios):
        return beam_search.decode_block(self._cfg(), coder, indices, count,
                                        bkey, ratios)

    def _encode_blocks(self, targets, coders, bkeys, ratios):
        return beam_search.encode_blocks(self._cfg(), targets, coders, bkeys,
                                         ratios)

    def _decode_blocks(self, coders, indices, counts, bkeys, ratios):
        return beam_search.decode_blocks(self._cfg(), coders, indices, counts,
                                         bkeys, ratios)

    def codelength_nats(self, coded: CodedLatent) -> jnp.ndarray:
        return jnp.sum(self._cfg().codelength_nats(coded.counts))
