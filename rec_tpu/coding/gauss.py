"""Diagonal-Gaussian math for relative entropy coding, as pure pytree functions.

This is the mathematical heart of iREC: a KL-partitioned auxiliary-variable
decomposition of a Gaussian channel.  Given a target q = N(mu_q, s_q^2) and a
coding (proposal) distribution p = N(mu_p, s_p^2), a zero-mean auxiliary
variable A ~ N(0, s_a^2) with s_a^2 <= s_p^2 splits the problem into

    q(A)       -- the marginal of A under the target     (auxiliary target)
    p(A)       -- N(0, s_a^2)                            (auxiliary coder)
    q(Z | A=a) -- the remaining conditional target
    p(Z | A=a) -- N(mu_p + a, s_p^2 - s_a^2)             (conditional coder)

so that KL[q(A) || p(A)] can be bounded per partition (Omega nats) and each
auxiliary variable coded with a shared-randomness sampler.

Semantics-parity reference: rec/coding/coder.py:141-171 in
gergely-flamich/relative-entropy-coding (formulas re-derived here from the
conditional-Gaussian identities; everything is a pure function over
``GaussianParams`` pytrees so it jits/vmaps/shards cleanly on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * log(2 * pi)


class GaussianParams(NamedTuple):
    """A diagonal Gaussian as a (loc, scale) pytree. Arbitrary array shape."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    @property
    def var(self) -> jnp.ndarray:
        return jnp.square(self.scale)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        z = (x - self.loc) / self.scale
        return -0.5 * jnp.square(z) - jnp.log(self.scale) - _HALF_LOG_2PI

    def sample(self, key, shape=()) -> jnp.ndarray:
        import jax

        eps = jax.random.normal(key, shape + jnp.shape(self.loc),
                                dtype=jnp.result_type(self.loc))
        return self.loc + self.scale * eps


def standard_normal_like(x: jnp.ndarray) -> GaussianParams:
    return GaussianParams(jnp.zeros_like(x), jnp.ones_like(x))


def kl_divergence(q: GaussianParams, p: GaussianParams) -> jnp.ndarray:
    """Elementwise KL[q || p] in nats for diagonal Gaussians."""
    var_ratio = jnp.square(q.scale / p.scale)
    mean_term = jnp.square((q.loc - p.loc) / p.scale)
    return 0.5 * (var_ratio + mean_term - 1.0 - jnp.log(var_ratio))


def auxiliary_coder(coder: GaussianParams, aux_var: jnp.ndarray) -> GaussianParams:
    """p(A) = N(0, aux_var).  (ref coder.py:141-144)"""
    return GaussianParams(jnp.zeros_like(coder.loc), jnp.sqrt(aux_var))


def auxiliary_target(target: GaussianParams, coder: GaussianParams,
                     aux_var: jnp.ndarray) -> GaussianParams:
    """q(A): marginal of the auxiliary variable under the target.

    mean = (mu_q - mu_p) * s_a^2 / s_p^2
    var  = s_q^2 s_a^4 / s_p^4 + s_a^2 (s_p^2 - s_a^2) / s_p^2
    (ref coder.py:147-154)
    """
    p_var = coder.var
    t_var = target.var
    ratio = aux_var / p_var
    mean = (target.loc - coder.loc) * ratio
    var = t_var * jnp.square(ratio) + aux_var * (p_var - aux_var) / p_var
    return GaussianParams(mean, jnp.sqrt(var))


def conditional_coder(coder: GaussianParams, aux_var: jnp.ndarray,
                      aux_sample: jnp.ndarray) -> GaussianParams:
    """p(Z | A=a) = N(mu_p + a, s_p^2 - s_a^2).  (ref coder.py:157-160)

    The variance difference is clamped at 0 so the final partition
    (aux_var == p_var exactly) and masked lanes stay NaN-free.
    """
    p_var = coder.var
    var = jnp.maximum(p_var - aux_var, 0.0)
    return GaussianParams(coder.loc + aux_sample, jnp.sqrt(var))


def conditional_target(target: GaussianParams, coder: GaussianParams,
                       aux_var: jnp.ndarray, aux_sample: jnp.ndarray) -> GaussianParams:
    """q(Z | A=a) for the *joint* implied by q over Z and the aux split.

    (ref coder.py:163-171)
    """
    p_var = coder.var
    t_var = target.var
    resid = p_var - aux_var
    denom = t_var * aux_var + p_var * resid
    mean = coder.loc + (aux_sample * t_var * p_var
                        + (target.loc - coder.loc) * resid * p_var) / denom
    var = t_var * p_var * resid / denom
    return GaussianParams(mean, jnp.sqrt(jnp.maximum(var, 0.0)))


def log_density_ratio(x: jnp.ndarray, num: GaussianParams,
                      den: GaussianParams) -> jnp.ndarray:
    """log num(x) - log den(x), elementwise, in a fusion-friendly quadratic form.

    For Gaussians the ratio is a per-dim quadratic  a*x^2 + b*x + c  with
        a = -0.5 (1/s_n^2 - 1/s_d^2)
        b = mu_n/s_n^2 - mu_d/s_d^2
        c = -0.5 (mu_n^2/s_n^2 - mu_d^2/s_d^2) - log(s_n/s_d)
    which XLA fuses into the surrounding reduction; the batched candidate
    scorer in ops/score.py exploits the same form as a matmul on the MXU.
    """
    inv_n = 1.0 / jnp.square(num.scale)
    inv_d = 1.0 / jnp.square(den.scale)
    a = -0.5 * (inv_n - inv_d)
    b = num.loc * inv_n - den.loc * inv_d
    c = (-0.5 * (jnp.square(num.loc) * inv_n - jnp.square(den.loc) * inv_d)
         - jnp.log(num.scale / den.scale))
    return (a * x + b) * x + c
