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
  * candidate streams are counter-based and row-addressed: ONE key per beam,
    key = fold(step, FNV-1a(history)) — replacing the reference's biased
    mod-10007 hash (beam_search_coder.py:32) with proper mixing while
    keeping the (index-prefix -> stream) contract — and candidate s = rows
    [s*D, (s+1)*D) of that key's counter space, so the winning row (and the
    decoder) regenerates from (key, index) with zero per-candidate key
    derivation;
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
from .partition import num_partitions, partition_schedule
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
    # Whole-partition Pallas mega-kernel on TPU (ops/mega_beam.py): the
    # batched encode's ENTIRE partition chain — candidate generation,
    # scoring, top-k, beam-carry — runs inside one kernel, removing the
    # scan path's per-step dispatch + HBM floor.  Measured 4.8x on the
    # coder core (25.3 -> 5.3 ms, 9-block 9000-dim latent, 24 live
    # partitions, v5e; PERF.md round 3).  Selection-only: winners and
    # decodes always replay through the pinned XLA path in f32, so the
    # bit-exact contract is unchanged.  Ignored off-TPU and for
    # shared_pool (already one MXU contraction per step).
    use_fused_kernel: bool = True
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
    if not cfg.use_fused_kernel or cfg.stream not in ("fmix", "threefry"):
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
    if not on_tpu:
        return False
    if cfg.n_beams > 128 or cfg.n_samples > 128:
        # The kernel's selection tile is (S_pad, 128) with one column per
        # beam; oversize configs (Omega*(1+eps) > ~4.85 -> S > 128, or
        # B > 128) fall back to the scan path rather than failing —
        # streams are identical on both paths, so files stay compatible.
        import warnings

        warnings.warn(
            f"mega-kernel supports n_beams<=128 and n_samples<=128 "
            f"(got B={cfg.n_beams}, S={cfg.n_samples}); using the XLA "
            f"scan encode path", stacklevel=3)
        return False
    return True


def _encode_step(cfg: BeamSearchConfig, target: GaussianParams,
                 coder: GaussianParams, n, block_key, sched, carry, t):
    """One partition step of the beam search for one latent block.

    ``sched`` = (sqrt_w, sqrt_ca, c_after), the precomputed (P,) closed-form
    variance schedule (partition.partition_schedule) — the per-step aux
    math reduces to scalar-row lookups, and the carry needs no cum_var.
    ``carry`` = (beams (B, D), hashes (B,), beam_indices (B, P)); a no-op
    (carry passthrough) for t >= n."""
    D = target.loc.shape[-1]
    B, S = cfg.n_beams, cfg.n_samples
    p_var = coder.var
    sqrt_w, sqrt_ca, c_after = sched

    def step(carry, t):
        beams, hashes, beam_indices = carry
        aux_scale = sqrt_w[t] * coder.scale
        cum_scale = sqrt_ca[t] * coder.scale
        # Target of the *cumulative* auxiliary variable A_1+...+A_t.
        aux_t = auxiliary_target(target, coder, c_after[t] * p_var)
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
            eps_pool = rng.normal_stream(pkey, (S, D),
                                         stream=cfg.stream)  # (S, D) f32
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
            beam_keys = None
        else:
            # Row-addressed candidate streams: ONE key per beam (from its
            # index history), candidate s = rows [s*D, (s+1)*D) of that
            # key's counter space — the same chunk addressing the
            # importance sampler uses.  vs the earlier per-candidate
            # fold_in tree this removes B*S threefry evaluations per step
            # (~25 us at production size) and gives the fused kernel a
            # pure (key, counter-offset) addressing scheme.
            beam_keys = jax.vmap(
                lambda h: rng.beam_stream_key(skey, h))(hashes)   # (B, 2)
            eps_gen = jax.vmap(
                lambda bk: rng.normal_stream(bk, (S, D), stream=cfg.stream))
            # Scoring runs in reduced precision: generate f32 and cast
            # (the scored value must be the ROUNDING of the f32 sample
            # the decoder regenerates); the cast fuses into the
            # reduction so no f32 candidate tensor reaches HBM.
            # Selection-only: winners are regenerated in f32 below, so
            # the carried beams stay exactly replay-consistent.
            sdt = jnp.dtype(cfg.score_dtype)
            eps_lp = eps_gen(beam_keys).astype(sdt)        # (B, S, D)
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
            # Regenerate only the B winning rows in f32 (counter offsets).
            winner_eps = jax.vmap(
                lambda bk, i: rng.normal_stream_row(bk, i, S, D,
                                                    stream=cfg.stream)
            )(beam_keys[parent], cand)                            # (B, D)
        new_beams = beams[parent] + aux_scale * winner_eps
        new_hashes = rng.fnv_step(hashes[parent], cand)
        new_beam_indices = beam_indices[parent].at[:, t].set(cand)

        active = t < n
        carry = tree_where(
            active,
            (new_beams, new_hashes, new_beam_indices),
            (beams, hashes, beam_indices))
        return carry

    return step(carry, t)


def _beam_init(cfg: BeamSearchConfig, D: int):
    B, P = cfg.n_beams, cfg.max_partitions
    return (jnp.zeros((B, D), jnp.float32),
            jnp.full((B,), rng.fnv_init()),
            jnp.zeros((B, P), jnp.int32))


def _schedule(cfg: BeamSearchConfig, n, ratios):
    """(sqrt_w, sqrt_ca, c_after): closed-form schedule rows for one block
    (selection-side — the decode replay pins its own copy)."""
    w, c_after = partition_schedule(n, cfg.max_partitions, ratios)
    return jnp.sqrt(w), jnp.sqrt(c_after), c_after


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
    sched = _schedule(cfg, n, ratios)

    def step(carry, t):
        return _encode_step(cfg, target, coder, n, block_key, sched,
                            carry, t), None

    init = _beam_init(cfg, D)
    (beams, _, beam_indices), _ = jax.lax.scan(
        step, init, jnp.arange(P, dtype=jnp.int32))

    return BeamCodedBlock(indices=beam_indices[0], count=n,
                          sample=beams[0] + coder.loc)


def encode_blocks(cfg: BeamSearchConfig, targets: GaussianParams,
                  coders: GaussianParams, bkeys,
                  ratios: Optional[jnp.ndarray] = None) -> BeamCodedBlock:
    """Batched encode of N latent blocks with partition early exit.

    On TPU with ``use_fused_kernel`` (the default there), the whole
    partition chain runs as ONE Pallas mega-kernel (ops/mega_beam.py):
    generation + scoring + top-k + carry never leave VMEM, removing the
    per-step dispatch + HBM floor of the scan path.  The scan path below is
    the reference semantics (and the CPU/fallback path); the kernel's
    returned sample is always the pinned decode replay, so the bit-exact
    contract is identical on both paths.  Under a further vmap (batched
    images) the kernel path stays fused: a custom batching rule flattens
    (image, block) into the kernel's block-grid axis (mega_beam), and the
    per-block partition masking in the kernel preserves the early exit the
    scan path loses to vmap's cond->select degradation below.  Oversized
    blocks-x-budget schedules are chunked inside mega_encode_blocks.

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

    if _use_fused(cfg) and not cfg.shared_pool:
        from ..ops.mega_beam import mega_encode_blocks

        indices, n = mega_encode_blocks(
            targets, coders, bkeys,
            kl_per_partition=cfg.kl_per_partition, n_beams=cfg.n_beams,
            n_samples=cfg.n_samples, max_partitions=P, stream=cfg.stream,
            ratios=ratios)
        # Selection-only kernel: report the pinned decode replay as the
        # carried sample (the public Coder.encode replays again — cheap —
        # and models consume that replay, so bit-exactness holds by
        # construction).
        sample = _replay_flat(cfg, coders, indices, n, bkeys, ratios)
        return BeamCodedBlock(indices=indices, count=n, sample=sample)

    kls = jax.vmap(lambda t, c: jnp.sum(kl_divergence(t, c)))(targets, coders)
    n = jnp.minimum(num_partitions(kls, cfg.kl_per_partition),
                    cfg.max_partitions)
    n_max = jnp.max(n)
    sched = jax.vmap(lambda nb: _schedule(cfg, nb, ratios))(n)  # (N, P) rows

    step_v = jax.vmap(
        lambda tgt, cod, nb, bk, sch, carry, t: _encode_step(
            cfg, tgt, cod, nb, bk, sch, carry, t),
        in_axes=(0, 0, 0, 0, 0, 0, None))

    def scan_step(carry, t):
        carry = jax.lax.cond(
            t < n_max,
            lambda c: step_v(targets, coders, n, bkeys, sched, c, t),
            lambda c: c, carry)
        return carry, None

    N, B = n.shape[0], cfg.n_beams
    init = (jnp.zeros((N, B, D), jnp.float32),
            jnp.full((N, B), rng.fnv_init()),
            jnp.zeros((N, B, P), jnp.int32))
    (beams, _, beam_indices), _ = jax.lax.scan(
        scan_step, init, jnp.arange(P, dtype=jnp.int32))
    return BeamCodedBlock(indices=beam_indices[:, 0], count=n,
                          sample=beams[:, 0] + coders.loc)


def _replay_keys(cfg: BeamSearchConfig, block_key, indices, count):
    """Per-step winning-beam stream keys for one block — pure integer.

    The history-hash chain h_{t+1} = fnv(h_t, idx_t) (frozen past ``count``)
    and the fold_in key tree are integer-exact by definition, so the whole
    (P,) key vector is computed up front with no sequential float carry —
    this is what lets the replay run as ONE batched generation instead of a
    per-step loop.  At small budgets the chain is statically unrolled
    (P*2 scalar u32 ops XLA fuses into one kernel); past 128 partitions it
    becomes a lax.scan — a 4000-budget unroll (pathological-KL images)
    produced an HLO big enough to SIGSEGV the TPU compiler.  Both forms
    compute the identical integer chain.  The winning candidate's row
    within each key's counter space is the transmitted index (row
    addressing)."""
    P = cfg.max_partitions
    if P <= 128:
        hs, h = [], rng.fnv_init()
        for t in range(P):
            hs.append(h)
            h = jnp.where(t < count, rng.fnv_step(h, indices[t]), h)
        hashes = jnp.stack(hs)  # (P,) u32
    else:
        def chain(h, t):
            return (jnp.where(t < count, rng.fnv_step(h, indices[t]), h),
                    h)

        _, hashes = jax.lax.scan(chain, rng.fnv_init(),
                                 jnp.arange(P, dtype=jnp.int32))

    def per_t(t, h):
        skey = rng.step_key(block_key, t)
        if cfg.shared_pool:
            return rng.pool_key(skey)
        return rng.beam_stream_key(skey, h)

    return jax.vmap(per_t)(jnp.arange(P), hashes)  # (P, 2) raw keys


def _replay_flat(cfg: BeamSearchConfig, coders: GaussianParams,
                 indices: jnp.ndarray, counts, bkeys, ratios) -> jnp.ndarray:
    """Flat (loop-free) replay of N blocks.

    The per-partition recurrence telescopes to scalar weights
    (partition.partition_schedule), and stream keys are integer-exact, so
    the replay is: key chain -> ONE batched (N, P, D) generation -> one
    masked contraction

        sample = p_scale * sum_t sqrt(w_t) * eps_t + loc.

    This replaces a ~P-step pinned scan (hundreds of tiny kernels; ~123 us
    per step of pure dispatch on a v5e chip) with ~6 kernels.  The float
    stages are pinned (utils.pin) at op granularity on the critical chain so
    the replay compiles to the identical islands in the standalone decoder,
    the encoder's embedded replay, and the models' in-graph passes
    (SURVEY.md §7 hard part 1)."""
    N, D = coders.loc.shape
    P = cfg.max_partitions
    counts = jnp.minimum(counts, P)

    keys = jax.vmap(lambda bk, idx, cnt: _replay_keys(cfg, bk, idx, cnt))(
        bkeys, indices, counts)                          # (N, P, 2)
    w, _ = jax.vmap(
        lambda cnt: partition_schedule(cnt, P, ratios))(counts)  # (N, P)
    sqrt_w = pin(jnp.sqrt(pin(w)))
    S = cfg.n_samples
    eps = pin(jax.vmap(jax.vmap(
        lambda k, i: rng.normal_stream_row(k, i, S, D, stream=cfg.stream)
    ))(keys, indices))                                   # (N, P, D)
    # Fixed-order contraction over the partition axis.  An einsum here is
    # 1 ulp non-deterministic ACROSS PROGRAMS at some shapes (XLA picks a
    # different reduction/FMA strategy for the encode program than for the
    # standalone decoder; observed at N=2, D=64 on TPU), which breaks the
    # encode().sample == decode(indices) contract.  A scan with each
    # multiply and add pinned separately has exactly one evaluation order.
    def _step(acc, we):
        w_t, e_t = we
        return pin(acc + pin(w_t[:, None] * e_t)), None

    acc0 = jnp.zeros((N, D), eps.dtype)
    acc, _ = jax.lax.scan(_step, acc0,
                          (jnp.moveaxis(sqrt_w, 1, 0),
                           jnp.moveaxis(eps, 1, 0)))
    return pin(coders.scale * pin(acc)) + coders.loc


def decode_block(cfg: BeamSearchConfig, coder: GaussianParams,
                 indices: jnp.ndarray, count, block_key,
                 ratios: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Replay the winning beam's candidate streams (ref
    beam_search_coder.py:523-547) — the single-block view of the flat
    batched replay (bit-identical: it IS the batched path at N=1)."""
    coders = GaussianParams(coder.loc[None], coder.scale[None])
    sample = _replay_flat(cfg, coders, indices[None],
                          jnp.asarray(count)[None], block_key[None], ratios)
    return sample[0]


def decode_blocks(cfg: BeamSearchConfig, coders: GaussianParams,
                  indices: jnp.ndarray, counts, bkeys,
                  ratios: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched replay of N blocks (the decode analogue of
    ``encode_blocks``); bit-identical per block to ``decode_block`` — the
    replay is elementwise over D and contracts over the step axis with a
    fixed reduction order, so batching cannot perturb its float ops."""
    return _replay_flat(cfg, coders, indices, counts, bkeys, ratios)
