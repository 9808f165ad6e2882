"""KL partitioning and latent-block split/merge.

A latent tensor's total KL is cut into <= Omega-nat chunks by a sequence of
auxiliary variables whose variance ratios follow either the reference's
empirical power law or a learned per-index table (ref coder.py:16,218-220).

``split``/``merge`` flatten a latent tensor, apply a fixed pseudo-random
permutation (so each block sees a representative KL mix), and cut it into
equal ``block_size`` chunks (ref coder.py:38-122).  TPU-first difference: the
ragged tail is *padded* with target==coder dimensions.  Padded dims have KL 0
and contribute exactly 0 to every candidate score, so they are coding no-ops,
and every block having identical shape means the whole per-block codec is a
single ``vmap`` (and, under a mesh, a ``shard_map``) instead of the
reference's serial Python loop over blocks (ref coder.py:435-452).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import rng
from .gauss import GaussianParams, kl_divergence

# Empirical auxiliary-variance-ratio power law fitted by the reference authors:
# ratio(i) = (i + 1) ** AUX_RATIO_POWER_LAW   (ref coder.py:16,218-220).
AUX_RATIO_POWER_LAW = -0.7864636765648174


def aux_variance_ratio(index, ratios: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Variance ratio for auxiliary variable ``index`` (0 is the last/full one).

    ``index`` may be a traced integer.  With ``ratios=None`` uses the power
    law; otherwise looks up a learned table, falling back to the power law
    for indices past the table's end — a fitted table is sized to the KL
    seen at initialize time, and a higher-KL block at encode time must get
    the extrapolation, not the table's last entry (silently reusing ratio
    [len-1] for every deeper partition mis-sizes the whole variance
    schedule; the reference raises instead, ref coder.py:226-230).  The
    gather itself stays clamped so masked lanes with garbage indices remain
    in-bounds.
    """
    power = jnp.power(jnp.asarray(index, jnp.float32) + 1.0,
                      AUX_RATIO_POWER_LAW)
    if ratios is None:
        return power
    idx = jnp.clip(index, 0, ratios.shape[0] - 1)
    return jnp.where(index >= ratios.shape[0], power, ratios[idx])


def partition_schedule(count, max_partitions: int,
                       ratios: Optional[jnp.ndarray] = None):
    """Closed-form auxiliary-variance schedule for one block.

    The per-partition recurrence (ref coder.py:505-540)

        aux_var_t = r_{i_t} * (p_var - cum_var_t),   i_t = count - 1 - t
        cum_var_{t+1} = cum_var_t + aux_var_t

    telescopes to  aux_var_t = p_var * w_t  with purely scalar weights

        w_t = r_{i_t} * prod_{u<t} (1 - r_{i_u}),

    so the whole schedule is one vectorized op over the static
    ``max_partitions`` budget instead of a sequential carry — this is what
    lets the decode replay run as a single batched generation + contraction
    (see beam_search.decode_blocks) rather than a per-step loop.

    Returns ``(w, c_after)`` of shape (max_partitions,): the per-step
    variance weights (0 for t >= count) and the cumulative variance
    fraction after each step, c_after[t] = sum_{u<=t} w_u.  For the power
    law r_{i=0} = 1, so c_after[count-1] == 1 exactly (the final partition
    absorbs all remaining variance); learned tables with r < 1 leave the
    same residual the reference's recurrence does.  ``max(1-r, 0)`` mirrors
    the recurrence's ``max(p_var - cum, 0)`` clamp for pathological r > 1.
    """
    from .utils import pin

    t = jnp.arange(max_partitions)
    i = jnp.maximum(count - 1 - t, 0)  # clamp dead lanes away from (0)**-p
    # Every float stage is pinned (optimization_barrier): the schedule
    # feeds BOTH the replay chain (whose bit-exactness across programs is
    # the decode contract) and, on the fused path, the mega-kernel's
    # qa/qb/ascale precompute — without barriers XLA CSEs and fuses the
    # shared computation differently per program, and a 1-ulp drift in w
    # breaks encode().sample == decode(indices) (seen at Omega=4, S=121).
    r = pin(aux_variance_ratio(i, ratios))
    r = pin(jnp.where(t < count, r, 0.0))
    one_minus = jnp.maximum(1.0 - r, 0.0)
    cp = pin(jnp.cumprod(one_minus))                # prod_{u<=t}
    prod_before = jnp.concatenate([jnp.ones((1,), cp.dtype), cp[:-1]])
    w = pin(r * prod_before)
    c_after = 1.0 - cp
    return w, c_after


def num_partitions(total_kl, kl_per_partition) -> jnp.ndarray:
    """ceil(KL / Omega), clamped to >= 1 (the reference always emits at least
    one index: its final coded_sample runs unconditionally, ref
    coder.py:542-558)."""
    n = jnp.ceil(total_kl / kl_per_partition).astype(jnp.int32)
    return jnp.maximum(n, 1)


class BlockSplit(NamedTuple):
    """Static split geometry for a flattened latent of ``num_dims`` dims."""

    num_dims: int
    block_size: int
    num_blocks: int
    padded: int


def plan_split(num_dims: int, block_size: Optional[int]) -> BlockSplit:
    if block_size is None or block_size >= num_dims:
        return BlockSplit(num_dims, num_dims, 1, num_dims)
    num_blocks = -(-num_dims // block_size)
    return BlockSplit(num_dims, block_size, num_blocks, num_blocks * block_size)


def split_permutation(root: jax.Array, plan: BlockSplit) -> jnp.ndarray:
    """The shared pseudo-random permutation of flattened dims (ref
    coder.py:62 uses a fixed seed; here it hangs off the transmitted root
    key so encoder and decoder derive it identically)."""
    return jax.random.permutation(rng.split_key(root), plan.num_dims)


def split_pair(target: GaussianParams, coder: GaussianParams,
               plan: BlockSplit, perm: jnp.ndarray):
    """Split (target, coder) into (num_blocks, block_size) blocks.

    Padding appends target==coder dims (standard normal), which are exact
    coding no-ops (KL 0, zero score contribution).
    """
    t_loc, t_scale, p_loc, p_scale = (
        jnp.ravel(target.loc)[perm], jnp.ravel(target.scale)[perm],
        jnp.ravel(coder.loc)[perm], jnp.ravel(coder.scale)[perm])
    pad = plan.padded - plan.num_dims
    if pad:
        zeros, ones = jnp.zeros((pad,), t_loc.dtype), jnp.ones((pad,), t_loc.dtype)
        t_loc = jnp.concatenate([t_loc, zeros])
        t_scale = jnp.concatenate([t_scale, ones])
        p_loc = jnp.concatenate([p_loc, zeros])
        p_scale = jnp.concatenate([p_scale, ones])
    shp = (plan.num_blocks, plan.block_size)
    return (GaussianParams(t_loc.reshape(shp), t_scale.reshape(shp)),
            GaussianParams(p_loc.reshape(shp), p_scale.reshape(shp)))


def split_coder(coder: GaussianParams, plan: BlockSplit, perm: jnp.ndarray
                ) -> GaussianParams:
    """Decode-side split of the coding distribution alone."""
    p_loc = jnp.ravel(coder.loc)[perm]
    p_scale = jnp.ravel(coder.scale)[perm]
    pad = plan.padded - plan.num_dims
    if pad:
        p_loc = jnp.concatenate([p_loc, jnp.zeros((pad,), p_loc.dtype)])
        p_scale = jnp.concatenate([p_scale, jnp.ones((pad,), p_scale.dtype)])
    shp = (plan.num_blocks, plan.block_size)
    return GaussianParams(p_loc.reshape(shp), p_scale.reshape(shp))


def merge(block_samples: jnp.ndarray, shape, plan: BlockSplit,
          perm: jnp.ndarray) -> jnp.ndarray:
    """Inverse of split: drop padding, un-permute, reshape (ref coder.py:87-122)."""
    flat = block_samples.reshape(-1)[: plan.num_dims]
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(plan.num_dims))
    return flat[inv].reshape(shape)


def block_kl(target: GaussianParams, coder: GaussianParams) -> jnp.ndarray:
    """Per-block total KL in nats; blocks on the leading axis."""
    return jnp.sum(kl_divergence(target, coder), axis=-1)
