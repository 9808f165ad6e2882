"""Fused beam-search partition step — Pallas TPU kernel.

Per partition the encoder scores B x S x D candidate elements whose values
come from counter-based streams; generating them with jax.random / the fmix
pipeline and scoring in XLA materializes multi-MB tensors and dominates
encode time (PERF.md).  This kernel generates the standard-normal candidate
values in-register and reduces them straight into per-candidate scores:

    bits (s, d) = stream_bits(beam_key, s*D + d)      (row addressing)
    eps  (s, d) = erfinv-normal mapping of bits
    score(s)    = sum_d quad(beam_row_d + aux_scale_d * eps_{s,d})

with the grid = one step per beam: each step reads only the (1, D_pad) beam
row and (2,) beam key it needs via the grid index, so no (B*S, D) beam
tensor is ever materialized in HBM.  Row addressing (one key per beam,
candidate s = rows [s*D, (s+1)*D) of its counter space — the coding layer's
stream contract since the per-candidate fold_in tree was retired) means the
kernel needs no per-candidate key input at all: the counters are an iota.

``stream`` selects the in-kernel bit generator and must match the coder
config ("fmix" default | "threefry").  The integer stages replicate the
XLA-path generators bit-exactly and the float stages value-faithfully
(ops/threefry_normal.py, rng.fmix_bits; unit-tested against the XLA scorer
in tests/test_ops.py).  Scoring is selection-only: winners and the decoder
regenerate their rows through rng.normal_stream_row in f32, so the
bit-exact decode contract is untouched (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .threefry_normal import _LO, _PARITY, _ROT0, _ROT1, erfinv_f32

_GOLDEN = np.uint32(0x9E3779B9)


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _threefry(k1, k2, x0, x1):
    """Unrolled threefry2x32 on broadcast-compatible uint32 arrays."""
    ks2 = k1 ^ k2 ^ _PARITY
    x = [x0 + k1, x1 + k2]

    def rounds(x, rots):
        for r in rots:
            a = x[0] + x[1]
            b = _rotl(x[1], r)
            x = [a, a ^ b]
        return x

    x = rounds(x, _ROT0)
    x = [x[0] + k2, x[1] + ks2 + np.uint32(1)]
    x = rounds(x, _ROT1)
    x = [x[0] + ks2, x[1] + k1 + np.uint32(2)]
    x = rounds(x, _ROT0)
    x = [x[0] + k1, x[1] + k2 + np.uint32(3)]
    x = rounds(x, _ROT1)
    x = [x[0] + k2, x[1] + ks2 + np.uint32(4)]
    x = rounds(x, _ROT0)
    return x[0] + ks2, x[1] + k1 + np.uint32(5)


def _fmix32(x):
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def _kernel(rows: int, D: int, D_pad: int, stream: str, key_ref, beams_ref,
            scale_ref, a_ref, b_ref, out_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    k1 = key_ref[i, 0]                       # scalar u32 (this beam's key)
    k2 = key_ref[i, 1]                       # keys live in SMEM (scalars)

    # Row-addressed counters: candidate s covers [s*D, (s+1)*D).  The
    # padded tail d >= D reads into the next row's counter range, which is
    # harmless: its quadratic coefficients are zero-padded.
    s_iota = jax.lax.broadcasted_iota(jnp.uint32, (rows, D_pad), 0)
    d_iota = jax.lax.broadcasted_iota(jnp.uint32, (rows, D_pad), 1)
    ctr = s_iota * np.uint32(D) + d_iota
    if stream == "fmix":
        bits = _fmix32(_fmix32(ctr * _GOLDEN + k1) ^ k2)
    else:
        o0, o1 = _threefry(k1, k2, jnp.zeros_like(ctr), ctr)
        bits = o0 ^ o1

    fbits = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    x01 = jax.lax.bitcast_convert_type(fbits, jnp.float32) - np.float32(1.0)
    u = jnp.maximum(x01 * (np.float32(1.0) - _LO) + _LO, _LO)
    eps = np.float32(np.sqrt(2.0)) * erfinv_f32(u)

    # beams_ref is ONE beam row (1, 1, D_pad), broadcast against this grid
    # step's rows — the per-row beam gather happens via the grid index, so
    # no (B*S, D) beam tensor ever exists in HBM.
    x = beams_ref[0] + scale_ref[:] * eps
    s = jnp.sum((a_ref[:] * x + b_ref[:]) * x, axis=-1, keepdims=True)
    out_ref[:] = jnp.broadcast_to(s, (rows, 128))


def fused_candidate_scores(beam_keys, beams, aux_scale, a, b, c_sum, *,
                           S: int, D: int, stream: str = "fmix",
                           interpret: bool = False):
    """beam_keys (B, 2) u32 (raw key data); beams (B, D); aux_scale/a/b (D,);
    -> (B, S) f32 scores.

    Grid = one step per beam: each step streams that beam's S candidate
    rows through VMEM, reading only the (1, D) beam row and (2,) key it
    needs.  HBM traffic is therefore O(B) keys in + O(B*S) scores out; the
    candidate values (B*S*D elements) live and die in-register.

    ``interpret=True`` runs the kernel through the Pallas interpreter so the
    blocking/padding logic is testable on CPU (tests/test_ops.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = beams.shape[0]
    D_pad = -(-D // 128) * 128
    S_pad = -(-S // 8) * 8
    pad_d = D_pad - D

    beams_p = jnp.pad(beams, ((0, 0), (0, pad_d)))[:, None, :]

    def vec(v):
        return jnp.pad(v, (0, pad_d))[None, :]

    kernel = functools.partial(_kernel, S_pad, D, D_pad, stream)
    scores = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (B, 2) keys, whole array
            pl.BlockSpec((1, 1, D_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_pad, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * S_pad, 128), jnp.float32),
        interpret=interpret,
    )(beam_keys, beams_p, vec(aux_scale), vec(a), vec(b))
    return scores[:, 0].reshape(B, S_pad)[:, :S] + c_sum
