"""Importance-sampling relative entropy coding (Gaussian), TPU-first.

Replaces the reference's per-partition Python loop + stateful-seed importance
sampler (ref rec/coding/importance_sampling.py, rec/coding/coder.py:493-584)
with a single ``lax.scan`` over a static ``max_partitions`` budget, masked by
the data-dependent partition count, so whole latent blocks encode as one
compiled program and ``vmap`` across blocks / ``shard_map`` across chips.

Candidate proposals are drawn in fixed-size chunks from counter-based streams
(rng.py) with a running argmax, bounding VMEM instead of materialising all
2^coding_bits proposals at once.  Decode regenerates only the chunk containing
the transmitted index — same stream addresses, bit-identical samples.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import rng
from .gauss import (GaussianParams, auxiliary_target, conditional_coder,
                    conditional_target, kl_divergence, log_density_ratio,
                    standard_normal_like)
from .partition import (aux_variance_ratio, num_partitions,
                        partition_schedule)
from .utils import pin


def tree_where(pred, new, old):
    """Select whole pytrees by a scalar predicate (mask for inactive steps)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(pred, n, o), new, old)


@dataclasses.dataclass(frozen=True)
class ImportanceCoderConfig:
    """GaussianCoder + ImportanceSampler knobs (ref samplers.py:61-101).

    ``coding_bits`` bits are spent per partition (2^bits proposals);
    ``max_partitions`` is the static scan budget (callers must ensure
    ceil(KL/Omega) <= max_partitions, cf. ref coder.py:226-230).
    """

    kl_per_partition: float = 3.0
    coding_bits: int = 12
    max_partitions: int = 24
    candidate_chunk: int = 1024
    # Proposal bit-generator, part of the stream contract (see
    # rng.normal_stream): "fmix" (default) | "threefry".
    stream: str = "fmix"

    @property
    def num_candidates(self) -> int:
        return 1 << self.coding_bits

    @property
    def num_chunks(self) -> int:
        chunk = min(self.candidate_chunk, self.num_candidates)
        return -(-self.num_candidates // chunk)

    @property
    def chunk_size(self) -> int:
        return min(self.candidate_chunk, self.num_candidates)


class CodedBlock(NamedTuple):
    indices: jnp.ndarray  # (max_partitions,) int32, valid for t < count
    count: jnp.ndarray    # () int32 — number of partitions actually coded
    sample: jnp.ndarray   # (D,) the coded (decoder-reproducible) sample


def _argmax_candidate(cfg: ImportanceCoderConfig, skey,
                      std_target: GaussianParams,
                      alpha: float = float("inf"), log_weighting_fn=None):
    """Running argmax of importance weights over chunked proposal streams.

    Returns (global index, winning standard-normal proposal vector).
    Finite ``alpha`` Gumbel-perturbs the selection (encoder-side only).
    """
    D = std_target.loc.shape[-1]
    C = cfg.chunk_size
    std = standard_normal_like(std_target.loc)
    gumbel_key = jax.random.fold_in(skey, 0x6b1)  # encoder-only stream

    def chunk_step(carry, c):
        best_w, best_idx, best_eps = carry
        eps = rng.normal_stream(jax.random.fold_in(skey, c), (C, D),
                                stream=cfg.stream)
        if log_weighting_fn is not None:
            logw = log_weighting_fn(eps)
        else:
            logw = jnp.sum(log_density_ratio(eps, std_target, std), axis=-1)
        if alpha != float("inf"):
            logw = alpha * logw + jax.random.gumbel(
                jax.random.fold_in(gumbel_key, c), (C,))
        j = jnp.argmax(logw)
        better = logw[j] > best_w
        return (jnp.where(better, logw[j], best_w),
                jnp.where(better, c * C + j, best_idx),
                jnp.where(better, eps[j], best_eps)), None

    init = (jnp.asarray(-jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32),
            jnp.zeros((D,), jnp.float32))
    (best_w, best_idx, best_eps), _ = jax.lax.scan(
        chunk_step, init, jnp.arange(cfg.num_chunks, dtype=jnp.int32))
    return best_idx.astype(jnp.int32), best_eps


def _regen_candidate(cfg: ImportanceCoderConfig, skey, index, dim: int):
    """Decode side: regenerate exactly the winning proposal from its index."""
    C = cfg.chunk_size
    eps = rng.normal_stream(jax.random.fold_in(skey, index // C), (C, dim),
                            stream=cfg.stream)
    return eps[index % C]


def encode_gaussian_importance_sample(target: GaussianParams,
                                      coder: GaussianParams,
                                      key, coding_bits: int,
                                      candidate_chunk: int = 1024,
                                      alpha: float = float("inf"),
                                      log_weighting_fn=None):
    """Single-shot importance coding of target vs coder (ref
    importance_sampling.py:186-256).  Returns (index, sample).

    ``alpha``: L-alpha selection norm — inf takes the argmax importance
    weight; finite alpha Gumbel-perturbs ``alpha * log w`` before the argmax
    (ref :244-249).  Deviation from the reference, by design: the Gumbel
    noise is a true Gumbel from uniforms, not the reference's accidental
    normal-based variant (ref rec/coding/utils.py:10-12, noted in SURVEY.md
    §7 quirks).  Selection-side only — decode is unchanged.

    ``log_weighting_fn``: optional custom scorer of standardized proposals
    (e.g. an SNIS energy, enabling REC of non-Gaussian targets, ref :234-238).
    """
    if alpha < 1.0:
        from .utils import CodingError

        raise CodingError(
            f"alpha must be in [1, inf), got {alpha} "
            "(ref importance_sampling.py:211-212)")
    cfg = ImportanceCoderConfig(coding_bits=coding_bits,
                                candidate_chunk=candidate_chunk)
    std_target = GaussianParams((target.loc - coder.loc) / coder.scale,
                                target.scale / coder.scale)
    idx, eps = _argmax_candidate(cfg, key, std_target, alpha=alpha,
                                 log_weighting_fn=log_weighting_fn)
    return idx, coder.loc + coder.scale * eps


def decode_gaussian_importance_sample(coder: GaussianParams, index, key,
                                      coding_bits: int,
                                      candidate_chunk: int = 1024):
    cfg = ImportanceCoderConfig(coding_bits=coding_bits,
                                candidate_chunk=candidate_chunk)
    eps = _regen_candidate(cfg, key, index, coder.loc.shape[-1])
    return coder.loc + coder.scale * eps


def _encode_step(cfg: ImportanceCoderConfig, n, block_key, ratios, carry, t):
    """One partition step for one block; carry = (target, coder), returns
    (new carry, chosen index) — a no-op passthrough for t >= n."""
    tgt, cod = carry
    i = n - 1 - t
    ratio = aux_variance_ratio(i, ratios)
    aux_var = ratio * cod.var
    aux_t = auxiliary_target(tgt, cod, aux_var)
    aux_scale = jnp.sqrt(aux_var)
    # Standardize the aux pair w.r.t. the (zero-mean) aux coder.
    std_t = GaussianParams(aux_t.loc / aux_scale, aux_t.scale / aux_scale)
    idx, eps = _argmax_candidate(cfg, rng.step_key(block_key, t), std_t)
    aux_sample = aux_scale * eps
    new_tgt = conditional_target(tgt, cod, aux_var, aux_sample)
    new_cod = conditional_coder(cod, aux_var, aux_sample)
    active = t < n
    carry = tree_where(active, (new_tgt, new_cod), (tgt, cod))
    return carry, jnp.where(active, idx, 0)


def encode_block(cfg: ImportanceCoderConfig, target: GaussianParams,
                 coder: GaussianParams, block_key,
                 ratios: Optional[jnp.ndarray] = None) -> CodedBlock:
    """Encode one latent block: scan over KL partitions (ref coder.py:493-559).

    Every step (including the last, via ratio(0)=1) is a uniform auxiliary
    step; the final conditional coder collapses to a point mass whose loc IS
    the coded sample, which makes the whole chain one masked scan.
    """
    total_kl = jnp.sum(kl_divergence(target, coder))
    # Clamp to the static scan budget: an over-budget block is coded with the
    # best max_partitions-step approximation instead of silently reporting a
    # count larger than the number of indices that exist (which would corrupt
    # the container).  Callers size max_partitions via required_partitions().
    n = jnp.minimum(num_partitions(total_kl, cfg.kl_per_partition),
                    cfg.max_partitions)

    def step(carry, t):
        return _encode_step(cfg, n, block_key, ratios, carry, t)

    (_, final_coder), indices = jax.lax.scan(
        step, (target, coder),
        jnp.arange(cfg.max_partitions, dtype=jnp.int32))
    return CodedBlock(indices=indices, count=n, sample=final_coder.loc)


def encode_blocks(cfg: ImportanceCoderConfig, targets: GaussianParams,
                  coders: GaussianParams, bkeys,
                  ratios: Optional[jnp.ndarray] = None) -> CodedBlock:
    """Batched encode of N blocks with partition early exit — the partition
    scan is outermost so one scalar ``lax.cond`` skips all steps past the
    batch max count (see beam_search.encode_blocks for the full rationale)."""
    N, P = targets.loc.shape[0], cfg.max_partitions
    kls = jax.vmap(lambda t, c: jnp.sum(kl_divergence(t, c)))(targets, coders)
    n = jnp.minimum(num_partitions(kls, cfg.kl_per_partition),
                    cfg.max_partitions)
    n_max = jnp.max(n)

    step_v = jax.vmap(
        lambda nb, bk, carry, t: _encode_step(cfg, nb, bk, ratios, carry, t),
        in_axes=(0, 0, 0, None))

    def scan_step(carry, t):
        dists, indices = carry
        dists, idx = jax.lax.cond(
            t < n_max,
            lambda c: step_v(n, bkeys, c, t),
            lambda c: (c, jnp.zeros((N,), jnp.int32)), dists)
        return (dists, indices.at[:, t].set(idx)), None

    init = ((targets, coders), jnp.zeros((N, P), jnp.int32))
    ((_, final_coder), indices), _ = jax.lax.scan(
        scan_step, init, jnp.arange(P, dtype=jnp.int32))
    return CodedBlock(indices=indices, count=n, sample=final_coder.loc)


def _replay_flat(cfg: ImportanceCoderConfig, coders: GaussianParams,
                 indices: jnp.ndarray, counts, bkeys, ratios) -> jnp.ndarray:
    """Flat (loop-free) replay of N blocks.

    The conditioned-coder recurrence's variance chain is index-independent
    and telescopes to scalar weights (partition.partition_schedule), and the
    per-step proposal keys are addressed purely by (step, index), so the
    replay is one batched (N, P, D) row regeneration + one masked
    contraction  sample = p_scale * sum_t sqrt(w_t) * eps_t + loc  — ~6
    kernels instead of a P-step pinned scan.  Float stages are pinned
    (utils.pin) so the replay compiles to identical islands in every
    embedding program (see beam_search._replay_flat for the full rationale).
    """
    N, D = coders.loc.shape
    P = cfg.max_partitions
    C = cfg.chunk_size
    counts = jnp.minimum(counts, P)

    def rows_for(bk, idx_row):
        def per_t(t, idx):
            ck = jax.random.fold_in(rng.step_key(bk, t), idx // C)
            return rng.normal_stream_row(ck, idx % C, C, D,
                                         stream=cfg.stream)
        return jax.vmap(per_t)(jnp.arange(P), idx_row)

    eps = pin(jax.vmap(rows_for)(bkeys, indices))        # (N, P, D)
    w, _ = jax.vmap(
        lambda cnt: partition_schedule(cnt, P, ratios))(counts)  # (N, P)
    sqrt_w = pin(jnp.sqrt(pin(w)))
    acc = pin(jnp.einsum("np,npd->nd", sqrt_w, eps))
    return pin(coders.scale * acc) + coders.loc


def decode_block(cfg: ImportanceCoderConfig, coder: GaussianParams,
                 indices: jnp.ndarray, count, block_key,
                 ratios: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Regenerate the coded sample from (indices, count) (ref
    coder.py:561-584) — the single-block view of the flat batched replay
    (bit-identical: it IS the batched path at N=1)."""
    coders = GaussianParams(coder.loc[None], coder.scale[None])
    sample = _replay_flat(cfg, coders, indices[None],
                          jnp.asarray(count)[None], block_key[None], ratios)
    return sample[0]


def decode_blocks(cfg: ImportanceCoderConfig, coders: GaussianParams,
                  indices: jnp.ndarray, counts, bkeys,
                  ratios: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched replay; bit-identical per block to ``decode_block`` (the
    replay is elementwise over D with a fixed-order step contraction)."""
    return _replay_flat(cfg, coders, indices, counts, bkeys, ratios)


def codelength_nats(cfg: ImportanceCoderConfig, count) -> jnp.ndarray:
    """count * coding_bits * ln 2 (ref samplers.py:100-101)."""
    return count * cfg.coding_bits * jnp.log(2.0)
