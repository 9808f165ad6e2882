"""Beam-search relative entropy coding — the production coder.

Reference semantics (rec/coding/beam_search_coder.py): keep B beams of partial
cumulative auxiliary-variable sums; per KL partition draw n_samples candidates
per beam from a stream determined by the beam's *index history*, score all
B x n_samples combined samples by log q_aux(x) - log p_cum_aux(x), keep the
top B.  The decoder replays only the winning beam's candidate streams from the
transmitted indices.

TPU-first re-design:
  * the partition loop is a masked ``lax.scan`` (static max_partitions);
  * candidate scoring is one fused (B, S, D) log-density-ratio reduction
    (quadratic form — XLA maps the contraction onto the MXU for large D; a
    Pallas kernel for the fully-fused generate+score path lives in
    rec_tpu/ops/beam_score.py);
  * beam selection is ``lax.top_k`` over B*S;
  * candidate streams are counter-based: key = fold(step, FNV-1a(history)),
    replacing the reference's biased mod-10007 hash (beam_search_coder.py:32)
    with proper mixing while keeping the (index-prefix -> stream) contract;
  * everything ``vmap``s over latent blocks and ``shard_map``s over chips.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import rng
from .gauss import (GaussianParams, auxiliary_target, kl_divergence,
                    log_density_ratio)
from .importance import tree_where
from .partition import aux_variance_ratio, num_partitions
from .utils import pin


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    """Paper knobs: Omega=kl_per_partition, B=n_beams, (1+eps)=extra_samples
    (ref beam_search_coder.py:414-429, README.md:74-80)."""

    kl_per_partition: float = 3.0
    n_beams: int = 20
    extra_samples: float = 1.2
    max_partitions: int = 24
    # Dtype for candidate *scoring* (selection only).  bf16 halves the HBM
    # traffic of the (B, S, D) candidate tensors — the encode bottleneck —
    # while the transmitted indices stay valid for the f32 decode replay, so
    # bit-exactness is unaffected (the reported sample IS the replay).
    score_dtype: str = "bfloat16"
    # Opt-in fused Pallas partition-step kernel on TPU (in-kernel threefry
    # + erfinv + scoring; see ops/fused_beam_step.py).  Wins ~25% on the
    # isolated scoring op but loses in the full encode (the pallas boundary
    # blocks XLA's fusion of the surrounding aux-distribution math), so the
    # default stays on the XLA path — see PERF.md.  Selection-only either
    # way: winners/decodes always replay through jax.random in f32.
    use_fused_kernel: bool = False
    # Opt-in while_loop partition loop for the SINGLE-block functions.
    # Mostly superseded: the default batched path (encode_blocks) already
    # early-exits at the batch's max data-dependent count via a scalar
    # lax.cond inside the scan, with none of this option's pathological
    # compile times (>10 min on the TPU toolchain).  Only useful when
    # per-block counts vary so wildly within a batch that per-block (not
    # batch-max) exit pays for the compile.
    dynamic_early_exit: bool = False
    # Candidate bit-generator: "fmix" (murmur3-finalizer counter hash, the
    # default — ~2.5x fewer integer ops on the measured encode bottleneck,
    # quality-validated against threefry in tests/test_roundtrip.py) or
    # "threefry" (jax.random, the conservative option).  Part of the stream
    # contract: encode and decode must agree, like n_beams.
    stream: str = "fmix"
    # TPU-first variant: all beams share ONE candidate pool of S rows per
    # partition (stream address = (step, candidate), no history hash) instead
    # of the reference's per-beam history-hash streams
    # (ref beam_search_coder.py:33-51).  Cuts candidate generation — the
    # measured encode bottleneck (threefry+erfinv on the VPU, see PERF.md) —
    # by a factor of B, and the expanded quadratic score becomes a
    # (B, D) @ (D, S) contraction on the MXU.  Search diversity is
    # preserved: the top-k still ranges over B parents x S candidates, and
    # combined samples differ through the parents.  Changes the stream
    # contract, so encode and decode must agree on this flag (it is part of
    # the coder config, like n_beams).
    shared_pool: bool = False

    @property
    def n_samples(self) -> int:
        """Candidates per beam per partition: floor(e^(Omega * extra))."""
        return int(math.exp(self.kl_per_partition * self.extra_samples))

    def codelength_nats(self, count) -> jnp.ndarray:
        """count * ln(n_samples) (ref beam_search_coder.py:549-550)."""
        return count * jnp.log(float(self.n_samples))


class BeamCodedBlock(NamedTuple):
    indices: jnp.ndarray  # (max_partitions,) int32 — winning beam's candidates
    count: jnp.ndarray    # () int32
    sample: jnp.ndarray   # (D,)


def _use_fused(cfg: BeamSearchConfig) -> bool:
    if not cfg.use_fused_kernel or cfg.stream != "threefry":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _candidate_keys(cfg: BeamSearchConfig, skey, hashes):
    """(B, S) per-candidate stream keys (see rng.candidate_key)."""
    S = cfg.n_samples

    def per_beam(h):
        bk = rng.beam_stream_key(skey, h)
        return jax.vmap(lambda s: rng.candidate_key(bk, s))(jnp.arange(S))

    return jax.vmap(per_beam)(hashes)


def _candidate_rows(keys, dim, stream="threefry", dtype=jnp.float32):
    """Standard-normal rows for a pytree of keys with arbitrary leading
    shape; each key yields an independent (dim,) stream."""
    flat = keys.reshape(-1, keys.shape[-1])
    rows = jax.vmap(
        lambda k: rng.normal_stream(k, (dim,), dtype=dtype, stream=stream)
    )(flat)
    return rows.reshape(keys.shape[:-1] + (dim,))


def _encode_step(cfg: BeamSearchConfig, target: GaussianParams,
                 coder: GaussianParams, n, block_key, ratios, carry, t):
    """One partition step of the beam search for one latent block.

    ``carry`` = (beams (B, D), hashes (B,), beam_indices (B, P),
    cum_var (D,)); a no-op (carry passthrough) for t >= n."""
    D = target.loc.shape[-1]
    B, S = cfg.n_beams, cfg.n_samples
    p_var = coder.var

    def step(carry, t):
        beams, hashes, beam_indices, cum_var = carry
        i = n - 1 - t
        ratio = aux_variance_ratio(i, ratios)
        aux_var = ratio * jnp.maximum(p_var - cum_var, 0.0)
        aux_scale = jnp.sqrt(aux_var)
        cum_scale = jnp.sqrt(aux_var + cum_var)
        # Target of the *cumulative* auxiliary variable A_1+...+A_t.
        aux_t = auxiliary_target(target, coder, aux_var + cum_var)
        cum_coder = GaussianParams(jnp.zeros((D,), beams.dtype), cum_scale)

        skey = rng.step_key(block_key, t)
        if cfg.shared_pool:
            # One pool of S candidate rows shared by all beams.  The
            # expanded quadratic  score(b,s) = sum_d qa x^2 + qb x + qc,
            # x = beams(b,d) + aux_scale(d) * eps(s,d), separates into a
            # per-beam constant, a (B,D)@(D,S) cross term (MXU), and a
            # per-candidate term — no (B,S,D) tensor is ever materialized
            # and only S*D normals are generated (vs B*S*D).
            from ..ops.beam_score import _quadratic_coeffs

            pkey = rng.pool_key(skey)
            pool_keys = jax.vmap(lambda s: rng.candidate_key(pkey, s))(
                jnp.arange(S))
            eps_pool = _candidate_rows(pool_keys, D, cfg.stream)  # (S, D) f32
            qa, qb, qc_sum = _quadratic_coeffs(aux_t, cum_coder)
            sdt = jnp.dtype(cfg.score_dtype)
            const_b = jnp.sum((qa * beams + qb) * beams, axis=-1) + qc_sum
            c1 = ((2.0 * qa * beams + qb) * aux_scale).astype(sdt)
            c2 = (qa * jnp.square(aux_scale)).astype(sdt)
            eps_lp = eps_pool.astype(sdt)
            cross = jnp.einsum("bd,sd->bs", c1, eps_lp,
                               preferred_element_type=jnp.float32)
            e2 = jnp.einsum("d,sd->s", c2, jnp.square(eps_lp),
                            preferred_element_type=jnp.float32)
            scores = const_b[:, None] + cross + e2[None, :]
            cand_keys = None
        elif _use_fused(cfg):
            cand_keys = _candidate_keys(cfg, skey, hashes)        # (B, S) keys
            from ..ops.beam_score import _quadratic_coeffs
            from ..ops.fused_beam_step import fused_candidate_scores

            qa, qb, qc = _quadratic_coeffs(aux_t, cum_coder)
            ckd = jax.vmap(jax.vmap(jax.random.key_data))(cand_keys)
            scores = fused_candidate_scores(
                ckd.astype(jnp.uint32), beams, aux_scale, qa, qb, qc,
                S=S, D=D)
        else:
            cand_keys = _candidate_keys(cfg, skey, hashes)        # (B, S) keys
            # Scoring runs in reduced precision: generate f32 and cast (the
            # scored value must be the ROUNDING of the f32 sample the
            # decoder regenerates); the cast fuses into the reduction so no
            # f32 candidate tensor reaches HBM.  Selection-only: winners are
            # regenerated in f32 below, so the carried beams stay exactly
            # replay-consistent.
            sdt = jnp.dtype(cfg.score_dtype)
            eps_lp = _candidate_rows(cand_keys, D,
                                     cfg.stream).astype(sdt)  # (B, S, D)
            combined_lp = (beams.astype(sdt)[:, None, :]
                           + aux_scale.astype(sdt) * eps_lp)
            scores = jnp.sum(
                log_density_ratio(combined_lp.astype(jnp.float32),
                                  aux_t, cum_coder), axis=-1)
        # First partition: all beams share the empty history, so their
        # candidate sets are identical; restrict to beam 0 to get B distinct
        # starts (ref beam_search_coder.py:495-505 uses a single stream).
        beam_ids = jnp.arange(B)
        scores = jnp.where((t == 0) & (beam_ids[:, None] > 0), -jnp.inf, scores)

        _, flat = jax.lax.top_k(scores.reshape(-1), B)
        parent = flat // S
        cand = (flat % S).astype(jnp.int32)

        if cfg.shared_pool:
            winner_eps = eps_pool[cand]                           # (B, D) f32
        else:
            # Regenerate only the B winning rows in f32 (per-candidate keys).
            winner_keys = cand_keys[parent, cand]                 # (B, 2)
            winner_eps = _candidate_rows(winner_keys, D,
                                         cfg.stream)          # (B, D)
        new_beams = beams[parent] + aux_scale * winner_eps
        new_hashes = rng.fnv_step(hashes[parent], cand)
        new_beam_indices = beam_indices[parent].at[:, t].set(cand)

        active = t < n
        carry = tree_where(
            active,
            (new_beams, new_hashes, new_beam_indices, cum_var + aux_var),
            (beams, hashes, beam_indices, cum_var))
        return carry

    return step(carry, t)


def _beam_init(cfg: BeamSearchConfig, D: int):
    B, P = cfg.n_beams, cfg.max_partitions
    return (jnp.zeros((B, D), jnp.float32),
            jnp.full((B,), rng.fnv_init()),
            jnp.zeros((B, P), jnp.int32),
            jnp.zeros((D,), jnp.float32))


def encode_block(cfg: BeamSearchConfig, target: GaussianParams,
                 coder: GaussianParams, block_key,
                 ratios: Optional[jnp.ndarray] = None) -> BeamCodedBlock:
    """Beam-search encode of one latent block (ref beam_search_coder.py:452-521).

    Contract note: the returned ``sample`` is the encoder-carried beam sum,
    which may differ from the pinned decode replay by float-fusion ULPs.
    Bit-exact consumers (the public ``Coder.encode``, the parallel codec, the
    models) must report ``decode_block(...)`` of the returned indices instead
    — the encoder embeds the decoder.
    """
    D = target.loc.shape[-1]
    P = cfg.max_partitions

    total_kl = jnp.sum(kl_divergence(target, coder))
    # Clamped to the static scan budget — see importance.encode_block.
    n = jnp.minimum(num_partitions(total_kl, cfg.kl_per_partition),
                    cfg.max_partitions)

    def step(carry, t):
        return _encode_step(cfg, target, coder, n, block_key, ratios,
                            carry, t), None

    init = _beam_init(cfg, D)
    if cfg.dynamic_early_exit:
        # Stops at the data-dependent partition count (under vmap over
        # latent blocks, at the batch max); the body is a no-op for
        # finished lanes (tree_where).
        (_, (beams, _, beam_indices, _)) = jax.lax.while_loop(
            lambda c: c[0] < n,
            lambda c: (c[0] + 1, step(c[1], c[0])[0]),
            (jnp.asarray(0, jnp.int32), init))
    else:
        (beams, _, beam_indices, _), _ = jax.lax.scan(
            step, init, jnp.arange(P, dtype=jnp.int32))

    return BeamCodedBlock(indices=beam_indices[0], count=n,
                          sample=beams[0] + coder.loc)


def encode_blocks(cfg: BeamSearchConfig, targets: GaussianParams,
                  coders: GaussianParams, bkeys,
                  ratios: Optional[jnp.ndarray] = None) -> BeamCodedBlock:
    """Batched encode of N latent blocks with partition early exit.

    Same streams and outputs as ``vmap(encode_block)``, but the partition
    scan is OUTERMOST with the per-block work vmapped inside it, so one
    scalar ``lax.cond`` skips every step past the batch's max partition
    count entirely.  The static ``max_partitions`` budget stays the compiled
    bound; the data-dependent count becomes the *executed* bound — on
    trained models (counts of 2-6 against budgets of 24+) this is the
    difference between paying for the budget and paying for the data.
    Under a further vmap (batched images) the cond degrades to a select
    (both branches execute) and throughput matches the old path — the skip
    branch is a passthrough.
    """
    D = targets.loc.shape[-1]
    P = cfg.max_partitions

    kls = jax.vmap(lambda t, c: jnp.sum(kl_divergence(t, c)))(targets, coders)
    n = jnp.minimum(num_partitions(kls, cfg.kl_per_partition),
                    cfg.max_partitions)
    n_max = jnp.max(n)

    step_v = jax.vmap(
        lambda tgt, cod, nb, bk, carry, t: _encode_step(
            cfg, tgt, cod, nb, bk, ratios, carry, t),
        in_axes=(0, 0, 0, 0, 0, None))

    def scan_step(carry, t):
        carry = jax.lax.cond(
            t < n_max,
            lambda c: step_v(targets, coders, n, bkeys, c, t),
            lambda c: c, carry)
        return carry, None

    N, B = n.shape[0], cfg.n_beams
    init = (jnp.zeros((N, B, D), jnp.float32),
            jnp.full((N, B), rng.fnv_init()),
            jnp.zeros((N, B, P), jnp.int32),
            jnp.zeros((N, D), jnp.float32))
    (beams, _, beam_indices, _), _ = jax.lax.scan(
        scan_step, init, jnp.arange(P, dtype=jnp.int32))
    return BeamCodedBlock(indices=beam_indices[:, 0], count=n,
                          sample=beams[:, 0] + coders.loc)


def _decode_step(cfg: BeamSearchConfig, coder: GaussianParams,
                 indices: jnp.ndarray, count, block_key, ratios, carry, t):
    """One replay step for one block; carry = (sample, history, cum_var)."""
    D = coder.loc.shape[-1]
    p_var = coder.var

    def step(carry, t):
        sample, h, cum_var = carry
        i = count - 1 - t
        # Every float op on this chain is pinned (utils.pin) so the replay
        # compiles to the identical island in the standalone decoder, the
        # encoder's embedded replay, and the models' in-graph passes.
        ratio = pin(aux_variance_ratio(i, ratios))
        aux_var = pin(ratio * jnp.maximum(p_var - cum_var, 0.0))
        aux_scale = pin(jnp.sqrt(aux_var))

        skey = rng.step_key(block_key, t)
        idx = indices[t]
        # Regenerate exactly one candidate row from its per-candidate key —
        # O(D) instead of O(S*D) per partition.
        if cfg.shared_pool:
            key = rng.candidate_key(rng.pool_key(skey), idx)
        else:
            key = rng.candidate_key(rng.beam_stream_key(skey, h), idx)
        eps = pin(rng.normal_stream(key, (D,), stream=cfg.stream))
        new_sample = sample + pin(aux_scale * eps)
        new_h = rng.fnv_step(h, idx)

        carry = tree_where(t < count,
                           (new_sample, new_h, cum_var + aux_var),
                           (sample, h, cum_var))
        return carry

    return step(carry, t)


def _decode_init(D: int):
    return (jnp.zeros((D,), jnp.float32), rng.fnv_init(),
            jnp.zeros((D,), jnp.float32))


def decode_block(cfg: BeamSearchConfig, coder: GaussianParams,
                 indices: jnp.ndarray, count, block_key,
                 ratios: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Replay the winning beam's candidate streams (ref
    beam_search_coder.py:523-547)."""
    D = coder.loc.shape[-1]
    count = jnp.minimum(count, cfg.max_partitions)

    def step(carry, t):
        return _decode_step(cfg, coder, indices, count, block_key, ratios,
                            carry, t), None

    init = _decode_init(D)
    if cfg.dynamic_early_exit:
        (_, (sample, _, _)) = jax.lax.while_loop(
            lambda c: c[0] < count,
            lambda c: (c[0] + 1, step(c[1], c[0])[0]),
            (jnp.asarray(0, jnp.int32), init))
    else:
        (sample, _, _), _ = jax.lax.scan(
            step, init, jnp.arange(cfg.max_partitions, dtype=jnp.int32))
    return sample + coder.loc


def decode_blocks(cfg: BeamSearchConfig, coders: GaussianParams,
                  indices: jnp.ndarray, counts, bkeys,
                  ratios: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched replay of N blocks with partition early exit (the decode
    analogue of ``encode_blocks``); bit-identical per block to
    ``decode_block`` — the replay chain is elementwise over D, so batching
    cannot perturb its float ops, and the pinned ops stay pinned."""
    N, D = coders.loc.shape
    counts = jnp.minimum(counts, cfg.max_partitions)
    n_max = jnp.max(counts)

    step_v = jax.vmap(
        lambda cod, idx, cnt, bk, carry, t: _decode_step(
            cfg, cod, idx, cnt, bk, ratios, carry, t),
        in_axes=(0, 0, 0, 0, 0, None))

    def scan_step(carry, t):
        carry = jax.lax.cond(
            t < n_max,
            lambda c: step_v(coders, indices, counts, bkeys, c, t),
            lambda c: c, carry)
        return carry, None

    init = (jnp.zeros((N, D), jnp.float32),
            jnp.full((N,), rng.fnv_init()),
            jnp.zeros((N, D), jnp.float32))
    (sample, _, _), _ = jax.lax.scan(
        scan_step, init, jnp.arange(cfg.max_partitions, dtype=jnp.int32))
    return sample + coders.loc
