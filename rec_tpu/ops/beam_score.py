"""Fused candidate scoring for beam-search REC — Pallas TPU kernel.

The hot op of the encoder (SURVEY.md §3.2): per KL partition, score all
B x S combined candidate samples under

    score(x) = sum_d [ log N(x_d; mu_d, s_d) - log N(x_d; 0, c_d) ]
             = sum_d [ a_d x_d^2 + b_d x_d + const_d ]

a per-dimension quadratic — i.e. one (B*S, D) x (D, 2) contraction on the
MXU plus a constant.  The kernel tiles candidates into VMEM and runs the
contraction per tile; scoring only affects encode-side index *selection*
(decode never scores), so swapping implementations cannot break the
bit-exact decode contract.

Used automatically by beam_search.encode_block on TPU for large D; the pure
jnp path remains the fallback (and the CPU-test reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.gauss import GaussianParams


def _quadratic_coeffs(num: GaussianParams, den: GaussianParams):
    inv_n = 1.0 / jnp.square(num.scale)
    inv_d = 1.0 / jnp.square(den.scale)
    a = -0.5 * (inv_n - inv_d)
    b = num.loc * inv_n - den.loc * inv_d
    c = (-0.5 * (jnp.square(num.loc) * inv_n
                 - jnp.square(den.loc) * inv_d)
         - jnp.log(num.scale / den.scale))
    return a, b, jnp.sum(c)


def _score_jnp(x, a, b, c_sum):
    return jnp.sum((a * x + b) * x, axis=-1) + c_sum


def _pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("tile_n",))
def _score_pallas(x2d, ab, c_sum, tile_n: int = 512):
    """x2d: (N, D) candidates (N padded to tile_n); ab: (D, 2) stacked
    [a, b]; -> (N,) scores.  Scores come back 2-D (N, 128) with the value
    broadcast along lanes, sidestepping Mosaic's 1-D output tiling
    constraint; the wrapper reads lane 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = x2d.shape

    def kernel(x_ref, ab_ref, out_ref):
        x = x_ref[:]
        ab_tile = ab_ref[:]
        a = ab_tile[:, 0]
        b = ab_tile[:, 1]
        # (tile_n, D) quadratic reduced over D on the VPU; the x*(a*x+b)
        # form keeps it two FMAs per element.
        s = jnp.sum((a[None, :] * x + b[None, :]) * x, axis=-1,
                    keepdims=True)
        out_ref[:] = jnp.broadcast_to(s, (s.shape[0], 128))

    grid = (pl.cdiv(N, tile_n),)
    scores = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), x2d.dtype),
    )(x2d, ab)
    return scores[:, 0] + c_sum


def score_candidates(combined, aux_target: GaussianParams,
                     cum_coder: GaussianParams, use_pallas: bool = True):
    """(B, S, D) candidates -> (B, S) log density-ratio scores."""
    B, S, D = combined.shape
    a, b, c_sum = _quadratic_coeffs(aux_target, cum_coder)
    if use_pallas and _pallas_available() and D % 128 == 0:
        tile_n = 512
        n = B * S
        n_pad = (-n) % tile_n
        x2d = combined.reshape(n, D)
        if n_pad:
            x2d = jnp.concatenate(
                [x2d, jnp.zeros((n_pad, D), x2d.dtype)])
        ab = jnp.stack([a, b], axis=-1)
        flat = _score_pallas(x2d, ab, c_sum, tile_n=tile_n)
        return flat[:n].reshape(B, S)
    return _score_jnp(combined, a, b, c_sum)
