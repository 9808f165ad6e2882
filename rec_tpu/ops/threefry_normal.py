"""Explicit replication of jax.random.normal's threefry pipeline.

The fused Pallas candidate kernel must generate, inside the kernel, the SAME
standard-normal values (up to score-precision rounding) that
``jax.random.normal(key, (D,))`` produces for the replay path.  This module
spells out that pipeline as plain jnp ops so it can be (a) unit-tested for
exact agreement against jax.random on every backend and (b) inlined into the
Pallas kernel body:

  * threefry2x32, 20 rounds, unrolled (jax/_src/prng.py:_threefry2x32_lowering)
  * partitionable counter layout: bits[i] = out0 ^ out1 of the block with
    counters (hi=0, lo=i) (jax/_src/prng.py:_threefry_random_bits_partitionable)
  * uniform mapping: (bits >> 9) | 0x3F800000 -> [1,2) - 1, scaled to
    (nextafter(-1,0), 1)  (jax/_src/random.py:_uniform)
  * normal: sqrt(2) * erfinv(u) with XLA's single-precision erfinv
    polynomial (value-faithful; may differ from the hardware op by ~1 ulp,
    which vanishes under the bf16 scoring round).

Only the *integer* part must be bit-exact (it addresses the stream); the
float tail needs value-faithfulness because the kernel's scores are
selection-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_ROT0 = (13, 15, 26, 6)
_ROT1 = (17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)
_LO = np.float32(np.nextafter(np.float32(-1.0), np.float32(0.0)))


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def threefry2x32(k1, k2, x0, x1):
    """Unrolled 20-round threefry; all args uint32 arrays (broadcastable)."""
    ks = [k1, k2, k1 ^ k2 ^ _PARITY]
    x = [x0 + ks[0], x1 + ks[1]]

    def rounds(x, rots):
        for r in rots:
            x0 = x[0] + x[1]
            x1 = _rotl(x[1], r)
            x = [x0, x0 ^ x1]
        return x

    x = rounds(x, _ROT0)
    x = [x[0] + ks[1], x[1] + ks[2] + np.uint32(1)]
    x = rounds(x, _ROT1)
    x = [x[0] + ks[2], x[1] + ks[0] + np.uint32(2)]
    x = rounds(x, _ROT0)
    x = [x[0] + ks[0], x[1] + ks[1] + np.uint32(3)]
    x = rounds(x, _ROT1)
    x = [x[0] + ks[1], x[1] + ks[2] + np.uint32(4)]
    x = rounds(x, _ROT0)
    return x[0] + ks[2], x[1] + ks[0] + np.uint32(5)


def random_bits(k1, k2, counters):
    """bits for flat positions ``counters`` (uint32): partitionable layout."""
    o0, o1 = threefry2x32(k1, k2, jnp.zeros_like(counters), counters)
    return o0 ^ o1


def erfinv_f32(x):
    """XLA's single-precision erfinv polynomial (xla/client/lib/math.cc)."""
    w = -jnp.log1p(-x * x)
    w_small = w < 5.0
    ws = jnp.where(w_small, w - 2.5, jnp.sqrt(jnp.maximum(w, 5.0)) - 3.0)

    small_coeffs = (2.81022636e-08, 3.43273939e-07, -3.5233877e-06,
                    -4.39150654e-06, 0.00021858087, -0.00125372503,
                    -0.00417768164, 0.246640727, 1.50140941)
    big_coeffs = (-0.000200214257, 0.000100950558, 0.00134934322,
                  -0.00367342844, 0.00573950773, -0.0076224613,
                  0.00943887047, 1.00167406, 2.83297682)

    def horner(coeffs):
        p = jnp.full_like(ws, coeffs[0])
        for c in coeffs[1:]:
            p = p * ws + np.float32(c)
        return p

    return jnp.where(w_small, horner(small_coeffs), horner(big_coeffs)) * x


def bits_to_normal(bits):
    """uint32 bits -> standard normal, matching jax.random.normal's mapping."""
    fbits = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    x01 = jax.lax.bitcast_convert_type(fbits, jnp.float32) - np.float32(1.0)
    u = x01 * (np.float32(1.0) - _LO) + _LO
    u = jnp.maximum(u, _LO)
    return np.float32(np.sqrt(2.0)) * erfinv_f32(u)


def normal_row(key, dim):
    """Replicates jax.random.normal(key, (dim,)) via the explicit pipeline;
    ``key`` is a raw (2,) uint32 key-data array."""
    counters = jnp.arange(dim, dtype=jnp.uint32)
    bits = random_bits(key[0], key[1], counters)
    return bits_to_normal(bits)
