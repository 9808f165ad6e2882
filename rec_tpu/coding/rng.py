"""Counter-based RNG discipline for the codec.

The entire codec is a deterministic-replay protocol: encoder and decoder share
only ``(seed, indices)`` and must regenerate bit-identical proposal streams.
The reference achieves this with global-seed statefulness
(``tf.random.set_seed`` + per-partition seed increments, ref coder.py:531) and
an ad-hoc index-history hash for beam streams (ref beam_search_coder.py:33-51).

Here the contract is explicit and purely functional: every stream is addressed
by a (root key, structured counter) pair via ``jax.random.fold_in`` on threefry
keys, so encode on N chips and decode on 1 chip agree bit-for-bit regardless of
sharding.  Stream address layout:

    root(seed)
      -> fold_in(SPLIT_TAG)                  : the block split permutation
      -> fold_in(BLOCK_TAG) -> fold_in(b)    : per latent-block subtree
           -> fold_in(t)                     : per KL-partition step
                -> fold_in(history_hash)     : per beam candidate stream,
                   candidate s = counter rows [s*D, (s+1)*D) of that key

Beam candidate streams must depend only on the beam's *index history* (so the
decoder can replay the winning beam's stream knowing only the transmitted
indices); the history is folded into a uint32 FNV-1a hash updated one index at
a time, replacing the reference's "slightly biased" mod-10007 hash with a
proper mixing function while keeping the same (index-prefix -> stream)
dependence (ref beam_search_coder.py:32-51).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Stream-purpose tags (arbitrary distinct constants).
SPLIT_TAG = 0x51137  # split permutation
BLOCK_TAG = 0xb10c  # latent-block subtree
MODEL_TAG = 0x30de1  # model-side sampling (training-time posterior samples)
POOL_TAG = 0x900d  # shared per-partition candidate pool (beam shared_pool)

# numpy (not jnp) scalars: creating a jnp constant at import time would
# initialize the XLA backend, which breaks jax.distributed.initialize in
# multi-host CLIs (it must run before any backend use).
FNV_OFFSET = np.uint32(2166136261)
FNV_PRIME = np.uint32(16777619)


def root_key(seed) -> jax.Array:
    """Root threefry key from an integer seed (the seed stored in the header)."""
    return jax.random.PRNGKey(seed)


def split_key(root: jax.Array) -> jax.Array:
    return jax.random.fold_in(root, SPLIT_TAG)


def block_key(root: jax.Array, block_id) -> jax.Array:
    return jax.random.fold_in(jax.random.fold_in(root, BLOCK_TAG), block_id)


def step_key(bkey: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(bkey, step)


def beam_stream_key(skey: jax.Array, history_hash) -> jax.Array:
    return jax.random.fold_in(skey, history_hash.astype(jnp.uint32))


def pool_key(skey: jax.Array) -> jax.Array:
    """Per-partition shared candidate pool subtree (beam shared_pool=True):
    all beams draw from ONE pool of S candidate rows per partition, so the
    stream address is (step, candidate) with no history hash.  Tagged so the
    pool namespace is disjoint from the per-beam ``beam_stream_key`` folds."""
    return jax.random.fold_in(skey, POOL_TAG)


def candidate_key(beam_key: jax.Array, candidate_idx) -> jax.Array:
    """Per-candidate stream key (LEGACY addressing — the beam codec now
    addresses candidate rows by counter offset within the beam key's stream,
    see ``normal_stream_row``, which removed B*S fold_ins per partition
    step; kept for external callers building custom stream layouts)."""
    return jax.random.fold_in(beam_key, candidate_idx)


def fnv_init() -> jnp.ndarray:
    return FNV_OFFSET


def fnv_step(h: jnp.ndarray, index) -> jnp.ndarray:
    """One FNV-1a step folding a chosen candidate index into a history hash."""
    return (h ^ jnp.uint32(index)) * FNV_PRIME


def normal_stream(key: jax.Array, shape, dtype=jnp.float32,
                  stream: str = "threefry") -> jnp.ndarray:
    """The canonical proposal stream: iid standard normals of a *static* shape.

    Encoder and decoder must call this with identical (key, shape, dtype,
    stream) to obtain identical bits; never draw a prefix with a different
    shape (unlike the reference's ``index + 1``-sample decode, ref
    importance_sampling.py:276, which relies on stateful-RNG prefix
    stability that counter-based generators do not provide).

    ``stream`` selects the bit generator and is part of the codec's stream
    contract (like n_beams — encode and decode must agree):

      * ``"threefry"`` — jax.random's threefry2x32 (20 rounds).  The
        conservative default.
      * ``"fmix"``    — a murmur3-finalizer counter hash (fmix_bits below),
        ~2.5x fewer integer ops per element.  Proposal generation is the
        measured encode bottleneck at ~57% of VPU peak (PERF.md), so the
        cheaper mixer is a direct throughput win; its statistical quality is
        validated against threefry in tests/test_roundtrip.py (moment /
        correlation tests and equal REC sample quality + codelength).

    Both are pure counter-based functions of (key, position): bit-exactly
    reproducible on any backend, any sharding, any batching.
    """
    if stream == "threefry":
        return jax.random.normal(key, shape, dtype=dtype)
    if stream != "fmix":
        raise ValueError(f"unknown stream {stream!r}")
    assert dtype == jnp.float32, "fmix stream is defined for float32 only"
    kd = jax.random.key_data(key).astype(jnp.uint32)
    n = math.prod(shape) if shape else 1
    ctr = jnp.arange(n, dtype=jnp.uint32)
    return _bits_to_normal_f32(fmix_bits(kd[0], kd[1], ctr)).reshape(shape)


def normal_stream_row(key: jax.Array, row, chunk_rows: int, dim: int,
                      stream: str = "threefry") -> jnp.ndarray:
    """Row ``row`` of ``normal_stream(key, (chunk_rows, dim))``.

    For "fmix" the row is generated directly from its counter offset
    (row*dim .. row*dim+dim) — bit-exact to the chunk's row by the
    counter-layout definition, O(dim) instead of O(chunk_rows*dim).  For
    "threefry" jax.random's counter layout is not exposed per-slice, so the
    conservative path materializes the chunk and slices (XLA may fuse the
    generation into the gather)."""
    if stream == "fmix":
        kd = jax.random.key_data(key).astype(jnp.uint32)
        ctr = (jnp.asarray(row, jnp.uint32) * jnp.uint32(dim)
               + jnp.arange(dim, dtype=jnp.uint32))
        return _bits_to_normal_f32(fmix_bits(kd[0], kd[1], ctr))
    return normal_stream(key, (chunk_rows, dim), stream=stream)[row]


_GOLDEN = np.uint32(0x9E3779B9)
_LO_F32 = np.float32(np.nextafter(np.float32(-1.0), np.float32(0.0)))


def _fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3's 32-bit finalizer: full avalanche in ~8 integer ops."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def fmix_bits(k1, k2, counters: jnp.ndarray) -> jnp.ndarray:
    """Counter-based uniform bits: two fmix32 rounds keyed by (k1, k2).

    The Weyl step decorrelates consecutive counters before the first
    avalanche; the second round folds in the other key half so nearby keys
    (fold_in neighbours) decohere too.  ~20 integer ops/element vs
    threefry2x32's ~50.
    """
    x = _fmix32(counters.astype(jnp.uint32) * _GOLDEN + k1)
    return _fmix32(x ^ k2)


def _bits_to_normal_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """jax.random.normal's bits->f32-normal tail (mantissa fill -> uniform on
    (nextafter(-1,0), 1) -> sqrt(2)*erfinv), shared by every stream."""
    fbits = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    x01 = jax.lax.bitcast_convert_type(fbits, jnp.float32) - np.float32(1.0)
    u = jnp.maximum(x01 * (np.float32(1.0) - _LO_F32) + _LO_F32, _LO_F32)
    return np.float32(np.sqrt(2.0)) * jax.lax.erf_inv(u)
