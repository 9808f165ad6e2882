"""Harsha-style rejection-sampling REC (ref rec/coding/rejection_sampling.py).

Split across the host/device boundary by what each side is good at:

  * mass estimation (sorted empirical log-ratios of oversampled target draws)
    — jitted jnp (ref get_t_p_mass, rejection_sampling.py:294-305);
  * the r/p* acceptance-buffer recursion — float64 host numpy with the
    geometric-interval fast path (ref get_r_pstar, rejection_sampling.py:
    308-346; f64 is deliberate — TPUs don't do f64, and the recursion is
    serial over ~100 intervals, so it stays on CPU);
  * the acceptance scan over fixed-size proposal rounds — jitted
    ``lax.fori``-style scan + a bounded spillover ``while_loop`` replacing
    the reference's unbounded Python ``while`` (rejection_sampling.py:
    377-396).

Proposals are *standard normal* streams (the caller standardizes the aux
pair), so decode is index arithmetic on the shared stream: sample =
stream(key, index // buffer)[index % buffer] (ref samplers.py:171-177).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rng
from .gauss import GaussianParams, kl_divergence, log_density_ratio, standard_normal_like
from .utils import CodingError


@dataclasses.dataclass(frozen=True)
class RejectionSamplerConfig:
    sample_buffer_size: int = 10000
    r_buffer_size: int = 10000
    mass_samples: int = 100
    oversampling: int = 100
    max_spillover_rounds: int = 1000
    max_kl: float = 20.0  # refuse above this (ref rejection_sampling.py:373-374)


# ---------------------------------------------------------------------------
# Mass estimation (device)
# ---------------------------------------------------------------------------

from functools import partial


@partial(jax.jit, static_argnums=(3, 4))
def estimate_mass(target: GaussianParams, coder: GaussianParams, key,
                  n_samples: int = 100, oversampling: int = 100):
    """Empirical discretization of the density ratio: draw n*o target samples,
    sort their log t/p ratios, keep the o/2-strided midpoints
    (ref get_t_p_mass)."""
    total = n_samples * oversampling
    y = target.sample(key, (total,))
    t_mass = jnp.full((total,), -jnp.log(float(n_samples)))
    p_mass = t_mass + jnp.sum(
        log_density_ratio(y, coder, target), axis=-1)
    log_ratios = t_mass - p_mass
    order = jnp.argsort(log_ratios)
    keep = order[oversampling // 2::oversampling]
    return log_ratios[keep], t_mass[keep], p_mass[keep]


# ---------------------------------------------------------------------------
# r / p* buffers (host, float64)
# ---------------------------------------------------------------------------

def r_pstar_naive(log_ratios, t_mass, p_mass, r_buffer_size: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """The defining recursion, one buffer entry at a time (slow; the
    differential-test baseline):
        r_i    = r_{i-1} + (1 - p*_{i-1})
        p*_i   = (1 - P(ratio < r_i)) * r_i + T(ratio < r_i)
    """
    ratios = np.exp(np.asarray(log_ratios, np.float64))
    t_cum = np.exp(np.logaddexp.accumulate(np.asarray(t_mass, np.float64)))
    p_cum_arr = np.exp(np.logaddexp.accumulate(np.asarray(p_mass, np.float64)))
    p_zero = 1.0 - np.exp(_logsumexp(np.asarray(p_mass, np.float64)))

    r_buffer = np.zeros(r_buffer_size)
    pstar_buffer = np.zeros(r_buffer_size)
    r, pstar, k = 0.0, 0.0, 0
    for i in range(r_buffer_size):
        r += 1.0 - pstar
        r_buffer[i] = r
        while k < len(ratios) and ratios[k] < r:
            k += 1
        pc = p_zero + (p_cum_arr[k - 1] if k > 0 else 0.0)
        tc = t_cum[k - 1] if k > 0 else 0.0
        pstar = (1.0 - pc) * r + tc
        pstar_buffer[i] = pstar
    return r_buffer, pstar_buffer


def r_pstar_buffers(log_ratios, t_mass, p_mass, r_buffer_size: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Fast path: within an interval where r stays below the next ratio bound
    the recursion is affine with fixed point (1-T)/(1-P), so whole geometric
    slices fill at once (ref get_r_pstar, rejection_sampling.py:308-346)."""
    ratios = np.exp(np.asarray(log_ratios, np.float64))
    t_cum_arr = np.exp(np.logaddexp.accumulate(np.asarray(t_mass, np.float64)))
    p_cum_arr = np.exp(np.logaddexp.accumulate(np.asarray(p_mass, np.float64)))
    p_zero = 1.0 - np.exp(_logsumexp(np.asarray(p_mass, np.float64)))

    r_buffer = np.zeros(r_buffer_size)
    pstar_buffer = np.zeros(r_buffer_size)
    r = 1.0
    r_buffer[0] = r
    i = 1
    for k, r_next in enumerate(ratios):
        if r_next < r:
            continue
        pc = p_zero + (p_cum_arr[k - 1] if k > 0 else 0.0)
        tc = t_cum_arr[k - 1] if k > 0 else 0.0
        fix = (1.0 - tc) / (1.0 - pc)
        # The recursion saturates at `fix`; a noisy empirical ratio above it
        # can never be crossed, so the slice runs to the buffer end (the
        # reference's log of a negative would NaN here).
        last = (k == len(ratios) - 1) or (r_next >= fix)
        if last:
            interval = r_buffer_size - i
        else:
            # Steps until r crosses r_next: geometric approach to `fix`.
            # True division (the reference floor-divides inside the ceil,
            # cutting each slice one step short on smooth targets —
            # measured 2e-2 divergence from the defining recursion).
            num = np.log((r_next - fix) / (r - fix))
            interval = max(1, min(r_buffer_size - i,
                                  int(np.ceil(num / np.log(pc)))))
        steps = 1.0 + np.arange(interval, dtype=np.float64)
        r_slice = fix - np.exp(np.log(pc) * steps + np.log(fix - r))
        r_buffer[i:i + interval] = r_slice
        pstar_buffer[i - 1:i + interval - 1] = \
            (1.0 - pc) * r_buffer[i - 1:i + interval - 1] + tc
        r = (pc ** interval) * (r - fix) + fix
        i += interval
        if i == r_buffer_size:
            pstar_buffer[-1] = (1.0 - pc) * r + tc
            break
        if last:
            raise CodingError("r buffer incomplete after all mass samples")
    return r_buffer, pstar_buffer


def _logsumexp(x):
    m = np.max(x)
    return m + np.log(np.sum(np.exp(x - m)))


# ---------------------------------------------------------------------------
# Coded sampling (device scan + bounded spillover)
# ---------------------------------------------------------------------------

class RejectionCodedSample(NamedTuple):
    index: jnp.ndarray   # () int32 global stream index
    sample: jnp.ndarray  # (D,) standard-normal proposal chosen
    found: jnp.ndarray   # () bool — False only if spillover budget exhausted


def _round_ratios(std_target: GaussianParams, key, round_idx, buffer: int):
    """Log importance ratios of one proposal round (standard-normal stream)."""
    D = std_target.loc.shape[-1]
    eps = rng.normal_stream(jax.random.fold_in(key, round_idx), (buffer, D))
    std = standard_normal_like(std_target.loc)
    return eps, jnp.sum(log_density_ratio(eps, std_target, std), axis=-1)


def rejection_sample(cfg: RejectionSamplerConfig, std_target: GaussianParams,
                     key, r_buffer: jnp.ndarray, pstar_buffer: jnp.ndarray
                     ) -> RejectionCodedSample:
    """Scan proposal rounds until acceptance (ref
    gaussian_rejection_sample_small).  ``std_target`` is the target
    standardized w.r.t. the coder; proposals are N(0, I)."""
    buf = cfg.sample_buffer_size
    n_rounds = cfg.r_buffer_size // buf
    D = std_target.loc.shape[-1]

    # Harsha acceptance for proposal i uses the state BEFORE seeing it:
    # accept iff u < (w - r_i) / (1 - P*_i) with r_0 = P*_0 = 0 — the
    # buffers store r_{i+1}/P*_{i+1}, so consume them shifted by one.
    # (The reference pairs proposal i with r_{i+1}/P*_{i+1} and a different
    # acceptance form, which measurably biases samples — mean 0.70 instead
    # of 0.50 on a N(0.5,0.7)-vs-N(0,1) test; the shifted rule reproduces
    # the target exactly.  Deliberate fix, not a replicated quirk.)
    r_shift = jnp.concatenate([jnp.zeros((1,), r_buffer.dtype),
                               r_buffer[:-1]])
    pstar_shift = jnp.concatenate([jnp.zeros((1,), pstar_buffer.dtype),
                                   pstar_buffer[:-1]])

    def main_round(carry, ridx):
        found, index, sample, ukey = carry
        eps, ratios = _round_ratios(std_target, key, ridx, buf)
        ukey, sub = jax.random.split(ukey)
        u = jax.random.uniform(sub, (buf,))
        start = ridx * buf
        accept = u < ((jnp.exp(ratios)
                       - jax.lax.dynamic_slice(r_shift, (start,), (buf,)))
                      / (1.0 - jax.lax.dynamic_slice(pstar_shift, (start,),
                                                     (buf,))))
        any_acc = jnp.any(accept)
        first = jnp.argmax(accept)
        newly = any_acc & ~found
        return ((found | any_acc,
                 jnp.where(newly, start + first, index),
                 jnp.where(newly, eps[first], sample),
                 ukey), None)

    init = (jnp.asarray(False), jnp.asarray(0, jnp.int32),
            jnp.zeros((D,), jnp.float32), jax.random.fold_in(key, 0x0acc))
    (found, index, sample, _), _ = jax.lax.scan(
        main_round, init, jnp.arange(n_rounds, dtype=jnp.int32))

    # Spillover: past the r buffer accept anything with ratio > log r_last
    # (ref rejection_sampling.py:387-396), bounded rounds.
    log_r_last = jnp.log(r_buffer[-1])

    def spill_cond(carry):
        done, ridx, *_ = carry
        return (~done) & (ridx < n_rounds + cfg.max_spillover_rounds)

    def spill_round(carry):
        done, ridx, index, sample = carry
        eps, ratios = _round_ratios(std_target, key, ridx, buf)
        accept = ratios > log_r_last
        any_acc = jnp.any(accept)
        first = jnp.argmax(accept)
        return (done | any_acc,
                ridx + 1,
                jnp.where(any_acc & ~done, ridx * buf + first, index),
                jnp.where(any_acc & ~done, eps[first], sample))

    done, _, index, sample = jax.lax.while_loop(
        spill_cond, spill_round,
        (found, jnp.asarray(n_rounds, jnp.int32), index, sample))
    # Encoder embeds decoder: report the decode replay of the accepted index
    # (the pinned regen below), not the scan-carried row — same discipline as
    # the beam/importance coders (see coding/utils.pin).
    replay = decode_rejection_sample(cfg, key, index, D)
    return RejectionCodedSample(index.astype(jnp.int32), replay, done)


def decode_rejection_sample(cfg: RejectionSamplerConfig, key, index,
                            dim: int) -> jnp.ndarray:
    """index -> proposal: regenerate round index//buffer, pick index%buffer
    (ref samplers.py:171-177).  The row is pinned so the replay is
    bit-identical in every embedding program."""
    from .utils import pin

    buf = cfg.sample_buffer_size
    eps = rng.normal_stream(jax.random.fold_in(key, index // buf), (buf, dim))
    return pin(eps[index % buf])


# ---------------------------------------------------------------------------
# Stateful sampler facade (codelength bookkeeping, ref samplers.py:104-177)
# ---------------------------------------------------------------------------

class RejectionSampler:
    """Host-side facade: owns averaged acceptance probabilities for
    codelength estimates, mirrors ref RejectionSampler's update/get_codelength
    semantics (running average over update() calls; spillover geometric
    tail)."""

    def __init__(self, cfg: Optional[RejectionSamplerConfig] = None):
        self.cfg = cfg or RejectionSamplerConfig()
        self.average_count = 0.0
        self.acceptance_probabilities = np.zeros(self.cfg.r_buffer_size)
        self.spillover_probability = 0.0
        self.spillover_acceptance = 0.0
        self.initialized = False

    def update(self, target: GaussianParams, coder: GaussianParams, key):
        lr, tm, pm = estimate_mass(target, coder, key,
                                   self.cfg.mass_samples, self.cfg.oversampling)
        _, pstar = r_pstar_buffers(np.asarray(lr), np.asarray(tm),
                                   np.asarray(pm), self.cfg.r_buffer_size)
        acc = pstar - np.concatenate([[0.0], pstar[:-1]])
        self.acceptance_probabilities = (
            (self.acceptance_probabilities * self.average_count + acc)
            / (self.average_count + 1.0))
        self.average_count += 1.0
        self.spillover_probability = 1.0 - self.acceptance_probabilities.sum()
        self.spillover_acceptance = (
            self.acceptance_probabilities[-1]
            / (1.0 - self.acceptance_probabilities[:-1].sum()))
        self.initialized = True

    def get_codelength(self, index: int) -> float:
        if not self.initialized:
            raise CodingError("RejectionSampler not initialized; call update()")
        if index < self.cfg.r_buffer_size:
            return float(-np.log(self.acceptance_probabilities[index]))
        extra = index - self.cfg.r_buffer_size
        return float(-(np.log(self.spillover_probability)
                       + np.log(1.0 - self.spillover_acceptance) * extra
                       + np.log(self.spillover_acceptance)))

    def coded_sample(self, target: GaussianParams, coder: GaussianParams, key):
        """Standardize, build buffers, run the acceptance scan.  Returns
        (index, sample in coder coordinates)."""
        kl = float(jnp.sum(kl_divergence(target, coder)))
        if kl >= self.cfg.max_kl:
            raise CodingError(
                f"KL divergence={kl:.2f} too high for rejection sampling")
        lr, tm, pm = estimate_mass(target, coder, key,
                                   self.cfg.mass_samples, self.cfg.oversampling)
        r_buf, pstar_buf = r_pstar_buffers(
            np.asarray(lr), np.asarray(tm), np.asarray(pm),
            self.cfg.r_buffer_size)
        std_target = GaussianParams((target.loc - coder.loc) / coder.scale,
                                    target.scale / coder.scale)
        out = rejection_sample(
            self.cfg, std_target, key,
            jnp.asarray(r_buf, jnp.float32), jnp.asarray(pstar_buf, jnp.float32))
        if not bool(out.found):
            raise CodingError("rejection sampling spillover budget exhausted")
        return int(out.index), coder.loc + coder.scale * out.sample

    def decode_sample(self, coder: GaussianParams, index, key) -> jnp.ndarray:
        eps = decode_rejection_sample(self.cfg, key, index,
                                      coder.loc.shape[-1])
        return coder.loc + coder.scale * eps
