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
from .threefry_normal import _LO, erfinv_f32

_GOLDEN = np.uint32(0x9E3779B9)
_NEG_INF = np.float32(-np.inf)
_BIG_I32 = np.int32(2 ** 30)


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _threefry2x32(k1, k2, x0, x1):
    """Unrolled 20-round threefry2x32 (jax/_src/prng.py lowering)."""
    ks2 = k1 ^ k2 ^ np.uint32(0x1BD11BDA)
    x = [x0 + k1, x1 + k2]

    def rounds(x, rots):
        for r in rots:
            a = x[0] + x[1]
            b = _rotl(x[1], r)
            x = [a, a ^ b]
        return x

    x = rounds(x, (13, 15, 26, 6))
    x = [x[0] + k2, x[1] + ks2 + np.uint32(1)]
    x = rounds(x, (17, 29, 16, 24))
    x = [x[0] + ks2, x[1] + k1 + np.uint32(2)]
    x = rounds(x, (13, 15, 26, 6))
    x = [x[0] + k1, x[1] + k2 + np.uint32(3)]
    x = rounds(x, (17, 29, 16, 24))
    x = [x[0] + k2, x[1] + ks2 + np.uint32(4)]
    x = rounds(x, (13, 15, 26, 6))
    return x[0] + ks2, x[1] + k1 + np.uint32(5)


def _fmix32(x):
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def _fold_in(k1, k2, data_u32):
    """jax.random.fold_in on raw key words: threefry2x32(key, [0, data])."""
    return _threefry2x32(k1, k2, jnp.zeros_like(data_u32), data_u32)


def _bits(stream, bk1, bk2, ctr):
    if stream == "fmix":
        return _fmix32(_fmix32(ctr * _GOLDEN + bk1) ^ bk2)
    o0, o1 = _threefry2x32(bk1, bk2, jnp.zeros_like(ctr), ctr)
    return o0 ^ o1


def _normal(bits):
    fbits = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    x01 = jax.lax.bitcast_convert_type(fbits, jnp.float32) - np.float32(1.0)
    u = jnp.maximum(x01 * (np.float32(1.0) - _LO) + _LO, _LO)
    return np.float32(np.sqrt(2.0)) * erfinv_f32(u)


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
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = targets.loc.shape
    P = max_partitions
    B, S = n_beams, n_samples
    if B > 128 or S > 128:
        raise ValueError(
            f"mega-kernel selection tile is (S, 128): needs n_beams<=128 "
            f"and n_samples<=128, got B={B}, S={S} — use the scan path "
            f"(beam_search.encode_blocks falls back automatically)")
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

    bkeys_raw = jax.vmap(jax.random.key_data)(bkeys).astype(jnp.uint32)

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
