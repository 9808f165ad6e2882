"""Whole-partition beam-search encode — ONE Pallas kernel per latent-block set.

The XLA encode path (coding/beam_search.py) runs the partition chain as a
``lax.scan`` whose per-step body dispatches ~10 kernels and round-trips the
(B, S, D) candidate tensors through HBM; at production size that floor is
~203 us/step of which only ~118 us is candidate compute (PERF.md).  This
kernel runs the ENTIRE chain — candidate generation, scoring, top-k beam
selection, and the beam-carry update — inside one ``pallas_call`` whose grid
is (blocks, partitions): TPU grids execute sequentially, so the partition
axis is the chain and the carry lives in VMEM/SMEM scratch that persists
across grid steps.  A partition step never touches HBM except to stream in
its three precomputed (D,) schedule rows.

What stays OUTSIDE the kernel (index-independent, precomputed in XLA):
the closed-form variance schedule (partition.partition_schedule), the
auxiliary-target quadratic score coefficients per (block, step), and the
per-(block, step) threefry step keys.  What must be INSIDE: everything that
depends on the search state — the beam-history fold_in (threefry of the
carried FNV hash), candidate bits (fmix or threefry, row-addressed), the
erfinv-normal map, quadratic scores, iterative top-k, and the parent-gather
carry update.

Selection-only semantics: the kernel chooses INDICES; the reported sample is
always the pinned XLA decode replay of those indices
(beam_search._replay_flat), so the bit-exact encode==decode contract is
untouched no matter how the kernel rounds its floats (SURVEY.md §7 hard
part 1).  The in-kernel erfinv polynomial (ops/threefry_normal.erfinv_f32)
tracks XLA's erf_inv to ~1 ulp, so the search explores the same candidate
sets the XLA path does; a rare tie can pick a different — equally valid —
index.

Semantics parity: ref rec/coding/beam_search_coder.py:66-109 (the per-
partition candidate scoring + top-k), :33-51 (history-hash streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import rng
from ..coding.gauss import GaussianParams, auxiliary_target, kl_divergence
from ..coding.partition import num_partitions, partition_schedule
from .threefry_normal import bits_to_normal as _normal
from .threefry_normal import threefry2x32 as _threefry2x32

_NEG_INF = np.float32(-np.inf)
_BIG_I32 = np.int32(2 ** 30)

# The kernel's generators ARE the replay-side ones: threefry2x32 /
# bits_to_normal come from ops/threefry_normal.py and the fmix mixer from
# coding/rng.py — one definition each, so the kernel-side and XLA-replay
# streams cannot silently diverge (tests/test_ops.py cross-checks them on a
# key/counter grid anyway, guarding against a Mosaic-vs-XLA integer-op
# regression).


def _fold_in(k1, k2, data_u32):
    """jax.random.fold_in on raw key words: threefry2x32(key, [0, data])."""
    return _threefry2x32(k1, k2, jnp.zeros_like(data_u32), data_u32)


def _bits(stream, bk1, bk2, ctr):
    if stream == "fmix":
        return rng.fmix_bits(bk1, bk2, ctr)
    o0, o1 = _threefry2x32(bk1, bk2, jnp.zeros_like(ctr), ctr)
    return o0 ^ o1


def _kernel(B, S, D, D_pad, S_pad, P_pad, P, stream,
            counts_ref, bkeys_ref, qa_ref, qb_ref, ascale_ref,
            out_ref,
            beams_ref, beams_tmp, hist_ref, hist_tmp, scores_ref,
            hashes_ref, hashes_tmp, parent_ref, cand_ref):
    from jax.experimental import pallas as pl

    nb = pl.program_id(0)
    t = pl.program_id(1)
    n_b = counts_ref[nb]
    # qa/qb/ascale stream in as (8, D_pad) blocks of the flattened
    # (N*P, D_pad) schedule (Mosaic's block-tiling rule has no legal
    # (1, 1, D_pad) view, and the whole tensor is N*P*4 KB — past VMEM at
    # production budgets); this step's row is `sub` within the block.
    sub = (nb * np.int32(P) + t) % np.int32(8)

    @pl.when(t == 0)
    def _init():
        beams_ref[:] = jnp.zeros((B, D_pad), jnp.float32)
        hist_ref[:] = jnp.zeros((B, P_pad), jnp.int32)
        for b in range(B):
            hashes_ref[b] = rng.FNV_OFFSET

    @pl.when(t < n_b)
    def _step():
        # Step key = fold_in(block_key, t) (rng.step_key), computed
        # in-kernel: an (N, P, 2) step-key table would blow SMEM at
        # production (blocks × budget) sizes.
        sk1, sk2 = _fold_in(bkeys_ref[nb, 0], bkeys_ref[nb, 1],
                            jnp.asarray(t, jnp.uint32))
        ascale = ascale_ref[pl.ds(sub, 1), :]              # (1, D_pad)
        qa = qa_ref[pl.ds(sub, 1), :]
        qb = qb_ref[pl.ds(sub, 1), :]

        # --- candidate generation + scoring, one beam at a time ---------
        # Stream contract (coding/rng.py): beam key = fold_in(step_key,
        # history hash); candidate s = counter rows [s*D, (s+1)*D) of that
        # key's stream.  The (S_pad, D_pad) candidate tile lives and dies
        # in VMEM.  At t == 0 every beam shares the empty history, so only
        # beam 0 is scored (the XLA path masks b > 0 to -inf instead).
        s_iota = jax.lax.broadcasted_iota(jnp.uint32, (S_pad, D_pad), 0)
        d_iota = jax.lax.broadcasted_iota(jnp.uint32, (S_pad, D_pad), 1)
        ctr = s_iota * np.uint32(D) + d_iota

        for b in range(B):
            @pl.when((t > 0) | (b == 0))
            def _score_beam(b=b):
                bk1, bk2 = _fold_in(sk1, sk2, hashes_ref[b])
                eps = _normal(_bits(stream, bk1, bk2, ctr))
                x = beams_ref[b:b + 1, :] + ascale * eps   # (S_pad, D_pad)
                sc = jnp.sum((qa * x + qb) * x, axis=-1,
                             keepdims=True)                # (S_pad, 1)
                scores_ref[:, b:b + 1] = sc

        # --- masks + iterative top-B (scores layout: (S_pad, 128),
        # column b = beam b) ----------------------------------------------
        srow = jax.lax.broadcasted_iota(jnp.int32, (S_pad, 128), 0)
        bcol = jax.lax.broadcasted_iota(jnp.int32, (S_pad, 128), 1)
        valid = (srow < S) & (bcol < B) & ((t > 0) | (bcol == 0))
        sc_all = jnp.where(valid, scores_ref[:], _NEG_INF)
        flat = srow * np.int32(128) + bcol
        for k in range(B):
            m = jnp.max(sc_all)
            f = jnp.min(jnp.where(sc_all == m, flat, _BIG_I32))
            # NaN-score guard: NaN never equals the max, leaving the
            # sentinel in f, whose decoded candidate (2^30/128) is OUT OF
            # ALPHABET for the container codec.  Degenerate steps (zero
            # aux variance from a fitted ratio ~1.0) select beam 0 /
            # candidate 0 instead — any in-range index replays losslessly
            # (selection-only kernel).
            f = jnp.where(f >= _BIG_I32, 0, f)
            parent_ref[k] = f % np.int32(128)
            cand_ref[k] = f // np.int32(128)
            sc_all = jnp.where(flat == f, _NEG_INF, sc_all)

        # --- carry update: regenerate the B winning rows (row addressing)
        # and parent-gather beams/history/hashes through tmp buffers ------
        d_row = jax.lax.broadcasted_iota(jnp.uint32, (1, D_pad), 1)
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (1, P_pad), 1)
        for k in range(B):
            p = parent_ref[k]
            c = cand_ref[k]
            bk1, bk2 = _fold_in(sk1, sk2, hashes_ref[p])
            ctr_row = jnp.asarray(c, jnp.uint32) * np.uint32(D) + d_row
            eps_row = _normal(_bits(stream, bk1, bk2, ctr_row))  # (1, D_pad)
            beams_tmp[k:k + 1, :] = (
                beams_ref[pl.ds(p, 1), :] + ascale * eps_row)
            # Write this beam's updated history row directly: parent's
            # history with the winning candidate at column t.  (An earlier
            # (B, 128) staging buffer broke at P_pad > 128, i.e. budgets
            # past 128 partitions — the big-image regime.)
            hist_tmp[k:k + 1, :] = jnp.where(
                p_iota == t, jnp.full((1, P_pad), c, jnp.int32),
                hist_ref[pl.ds(p, 1), :])
            hashes_tmp[k] = (hashes_ref[p] ^ jnp.asarray(c, jnp.uint32)) \
                * rng.FNV_PRIME
        beams_ref[:] = beams_tmp[:]
        hist_ref[:] = hist_tmp[:]
        for k in range(B):
            hashes_ref[k] = hashes_tmp[k]

    # The winning beam's history so far; the write at this block's last t
    # is the one that sticks (the output lives whole in VMEM).
    out_ref[pl.ds(nb, 1), :] = hist_ref[0:1, :]


def mega_encode_blocks(targets: GaussianParams, coders: GaussianParams,
                       bkeys, *, kl_per_partition: float, n_beams: int,
                       n_samples: int, max_partitions: int, stream: str,
                       ratios=None, interpret: bool = False):
    """Fused whole-partition beam-search encode of N latent blocks.

    targets/coders: (N, D) GaussianParams; bkeys: (N,) typed PRNG keys.
    Returns (indices (N, max_partitions) int32, counts (N,) int32) with the
    same stream contract as beam_search.encode_blocks — decode with the
    standard replay.

    Batching contract: under ``jax.vmap`` (batched-image serving) a custom
    batching rule flattens the (image, block) axes into this kernel's block
    grid axis — batched images are structurally just more blocks, each with
    its own key — so the pallas_call itself is never vmapped (a vmapped
    call batches the SMEM count/key specs into shapes Mosaic's tiling rules
    reject on real TPU; interpret mode accepts them, which is how the gap
    hid until round 4).  Oversized blocks-x-budget schedules are chunked
    over the block axis automatically (blocks are independent), replacing
    the round-4 512 MiB scan-path fallback.
    """
    if n_beams > 128 or n_samples > 128:
        raise ValueError(
            f"mega-kernel selection tile is (S, 128): needs n_beams<=128 "
            f"and n_samples<=128, got B={n_beams}, S={n_samples} — use the "
            f"scan path (beam_search.encode_blocks falls back automatically)")
    bkeys_raw = jax.vmap(jax.random.key_data)(bkeys).astype(jnp.uint32)
    fn = _fused_fn(float(kl_per_partition), int(n_beams), int(n_samples),
                   int(max_partitions), str(stream), bool(interpret),
                   ratios is None)
    if ratios is None:
        return fn(targets, coders, bkeys_raw)
    return fn(targets, coders, bkeys_raw, jnp.asarray(ratios, jnp.float32))


# Schedule-tensor HBM budget per kernel call: a 1.7 GiB schedule SIGSEGV'd
# the TPU compiler in round 3; chunking over the (independent) block axis
# keeps every call under this while preserving streams exactly.
_SCHED_LIMIT_BYTES = 1 << 29


@functools.lru_cache(maxsize=None)
def _fused_fn(kl_per_partition, n_beams, n_samples, max_partitions, stream,
              interpret, no_ratios):
    """Cached custom_vmap wrapper for one static kernel configuration."""

    def impl(targets, coders, bkeys_raw, ratios):
        if ratios is not None:
            # custom_vmap can hand unbatched args through as numpy-backed
            # literals whose __getitem__ rejects tracer indices; re-wrap.
            ratios = jnp.asarray(ratios, jnp.float32)
        N = targets.loc.shape[0]
        D = targets.loc.shape[1]
        D_pad = -(-D // 128) * 128
        per_block = 3 * max_partitions * D_pad * 4
        chunk = max(1, min(N, _SCHED_LIMIT_BYTES // per_block))
        call = functools.partial(
            _mega_call, kl_per_partition=kl_per_partition, n_beams=n_beams,
            n_samples=n_samples, max_partitions=max_partitions,
            stream=stream, interpret=interpret)
        if chunk >= N:
            return call(targets, coders, bkeys_raw, ratios)
        # Pad to a chunk multiple (pad blocks: target == coder == N(0,1)
        # -> KL 0 -> count 0 -> every kernel step masked) and run one
        # compiled kernel shape over equal slices.
        n_chunks = -(-N // chunk)
        pad = n_chunks * chunk - N

        def pad_params(p, scale_fill):
            return GaussianParams(
                jnp.pad(p.loc, ((0, pad), (0, 0))),
                jnp.pad(p.scale, ((0, pad), (0, 0)),
                        constant_values=scale_fill))

        tp = pad_params(targets, 1.0)
        cp = pad_params(coders, 1.0)
        kp = jnp.pad(bkeys_raw, ((0, pad), (0, 0)))
        inds, ns = [], []
        for i in range(n_chunks):
            sl = slice(i * chunk, (i + 1) * chunk)
            ind, n = call(
                GaussianParams(tp.loc[sl], tp.scale[sl]),
                GaussianParams(cp.loc[sl], cp.scale[sl]), kp[sl], ratios)
            inds.append(ind)
            ns.append(n)
        return (jnp.concatenate(inds)[:N], jnp.concatenate(ns)[:N])

    @jax.custom_batching.custom_vmap
    def fused(*args):
        targets, coders, bkeys_raw = args[:3]
        ratios = None if no_ratios else args[3]
        return impl(targets, coders, bkeys_raw, ratios)

    @fused.def_vmap
    def _rule(axis_size, in_batched, *args):
        # Flatten (image, block) into the kernel's block axis: B images x N
        # blocks = B*N independent blocks with per-image keys.  No vmapped
        # pallas_call, no batched SMEM specs, and the kernel's per-block
        # partition masking (t < n_b) IS the early exit the scan path loses
        # under vmap (VERDICT r4 next-step #1).
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size,) + x.shape)

        def flat(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        targets, coders, bkeys_raw = (
            jax.tree.map(bcast, a, b)
            for a, b in zip(args[:3], in_batched[:3]))
        targets, coders, bkeys_raw = (
            jax.tree.map(flat, a) for a in (targets, coders, bkeys_raw))
        if no_ratios:
            ratios = None
        else:
            ratios = args[3]
            if jax.tree.leaves(in_batched[3])[0]:
                raise NotImplementedError(
                    "per-image aux-variance-ratio tables cannot share one "
                    "fused kernel call; broadcast the table instead")
        ind, n = impl(targets, coders, bkeys_raw, ratios)
        N = ind.shape[0] // axis_size
        return ((ind.reshape(axis_size, N, ind.shape[-1]),
                 n.reshape(axis_size, N)), (True, True))

    return fused


def _mega_call(targets: GaussianParams, coders: GaussianParams,
               bkeys_raw, ratios, *, kl_per_partition: float, n_beams: int,
               n_samples: int, max_partitions: int, stream: str,
               interpret: bool):
    """One pallas_call over N latent blocks (schedule precompute + kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = targets.loc.shape
    P = max_partitions
    B, S = n_beams, n_samples
    D_pad = -(-D // 128) * 128
    S_pad = -(-S // 8) * 8
    P_pad = -(-P // 128) * 128

    # ---- index-independent precompute (XLA) ----------------------------
    kls = jax.vmap(lambda t, c: jnp.sum(kl_divergence(t, c)))(targets, coders)
    n = jnp.minimum(num_partitions(kls, kl_per_partition), P)  # (N,)

    def sched_one(nb):
        w, c_after = partition_schedule(nb, P, ratios)
        return w, c_after

    w, c_after = jax.vmap(sched_one)(n)                        # (N, P)

    def coeffs_one(tgt, cod, w_t, ca_t):
        # One (block, step): aux target vs cumulative coder quadratic.
        p_var = cod.var
        aux_t = auxiliary_target(tgt, cod, ca_t * p_var)
        cum_scale = jnp.sqrt(ca_t) * cod.scale
        inv_n = 1.0 / jnp.square(aux_t.scale)
        inv_d = 1.0 / jnp.square(cum_scale)
        qa = -0.5 * (inv_n - inv_d)
        qb = aux_t.loc * inv_n
        ascale = jnp.sqrt(w_t) * cod.scale
        return qa, qb, ascale

    # vmap over steps then blocks -> (N, P, D); the per-step constant term
    # is dropped (it shifts every candidate's score equally, so selection
    # is invariant to it).
    qa, qb, ascale = jax.vmap(
        lambda tgt, cod, w_b, ca_b: jax.vmap(
            lambda w_t, ca_t: coeffs_one(tgt, cod, w_t, ca_t))(w_b, ca_b)
    )(targets, coders, w, c_after)
    # Degenerate schedule steps (w_t = 0 mid-chain when a fitted ratio hits
    # 1.0, or c_after = 1 early) give zero aux variances -> inf/NaN
    # coefficients -> NaN scores.  Keep everything finite: the step then
    # scores all candidates equally and the NaN guard in the kernel picks
    # a deterministic in-range index.
    qa = jnp.nan_to_num(qa, nan=0.0, posinf=0.0, neginf=0.0)
    qb = jnp.nan_to_num(qb, nan=0.0, posinf=0.0, neginf=0.0)
    ascale = jnp.nan_to_num(ascale, nan=0.0, posinf=0.0, neginf=0.0)

    pad_d = D_pad - D
    if pad_d:
        qa = jnp.pad(qa, ((0, 0), (0, 0), (0, pad_d)))
        qb = jnp.pad(qb, ((0, 0), (0, 0), (0, pad_d)))
        ascale = jnp.pad(ascale, ((0, 0), (0, 0), (0, pad_d)))

    # The (N, P, D_pad) schedule tensors flatten to (N*P, D_pad) rows and
    # stream into VMEM as (8, D_pad) blocks selected by the grid index map
    # — Mosaic's block-tiling rule has no legal (1, 1, D_pad) view, and
    # the whole tensor (N*P*4 KB each, ×3) is past VMEM at production
    # blocks × budget sizes.  Step keys are computed in-kernel from the
    # per-block keys for the same reason (an (N, P, 2) table outgrows
    # SMEM).
    rows8 = -(-(N * P) // 8) * 8
    pad_r = rows8 - N * P
    qa = jnp.pad(qa.reshape(N * P, D_pad), ((0, pad_r), (0, 0)))
    qb = jnp.pad(qb.reshape(N * P, D_pad), ((0, pad_r), (0, 0)))
    ascale = jnp.pad(ascale.reshape(N * P, D_pad), ((0, pad_r), (0, 0)))
    sched_spec = pl.BlockSpec((8, D_pad), lambda nb, t: ((nb * P + t) // 8, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, B, S, D, D_pad, S_pad, P_pad, P,
                               stream)
    hist = pl.pallas_call(
        kernel,
        grid=(N, P),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts (N,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bkeys (N, 2)
            sched_spec,                              # qa
            sched_spec,                              # qb
            sched_spec,                              # ascale
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, D_pad), jnp.float32),     # beams
            pltpu.VMEM((B, D_pad), jnp.float32),     # beams_tmp
            pltpu.VMEM((B, P_pad), jnp.int32),       # hist
            pltpu.VMEM((B, P_pad), jnp.int32),       # hist_tmp
            pltpu.VMEM((S_pad, 128), jnp.float32),   # scores
            pltpu.SMEM((B,), jnp.uint32),            # hashes
            pltpu.SMEM((B,), jnp.uint32),            # hashes_tmp
            pltpu.SMEM((B,), jnp.int32),             # parents
            pltpu.SMEM((B,), jnp.int32),             # cands
        ],
        interpret=interpret,
    )(n, bkeys_raw, qa, qb, ascale)
    return hist[:, :P], n
