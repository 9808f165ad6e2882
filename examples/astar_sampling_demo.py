"""A* sampling demo (parity: ref notebooks/coding/Sampling.ipynb, which
prototypes Maddison-style A* sampling and a mixture-of-Gaussians
auxiliary-variable construction).

Draws exact samples from a 1-D mixture of Gaussians p by perturbing a
Gaussian proposal q with a Gumbel process: regions of the real line carry
Gumbel(log q-mass) maxima, the search pops the region with the highest
optimistic score Gumbel + max_x o(x) (o = log p - log q), and terminates
when the best found Gumbel + o(X) beats every frontier bound.  The region
chain is host-side (a priority queue is inherently data-dependent — this is
analysis-tier code, ref §2.6), the density math is jnp.

Validates the sampler with moment checks against direct MoG sampling.

Usage: python examples/astar_sampling_demo.py --samples 200
"""

import argparse
import heapq
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# Target: 3-component MoG (the notebook's aux-variable builder workload).
MOG_W = np.array([0.3, 0.5, 0.2])
MOG_LOC = np.array([-2.0, 0.5, 3.0])
MOG_SCALE = np.array([0.4, 0.7, 0.3])
# Proposal: wide Gaussian covering the mixture.
Q_LOC, Q_SCALE = 0.0, 3.0


@jax.jit
def log_ratio(x):
    """o(x) = log p(x) - log q(x), evaluated in jnp."""
    comp = (-0.5 * jnp.square((x[..., None] - MOG_LOC) / MOG_SCALE)
            - jnp.log(MOG_SCALE) - 0.9189385332046727 + jnp.log(MOG_W))
    log_p = jax.nn.logsumexp(comp, axis=-1)
    log_q = (-0.5 * jnp.square((x - Q_LOC) / Q_SCALE)
             - math.log(Q_SCALE) - 0.9189385332046727)
    return log_p - log_q


def _bound(lo, hi, grid=512):
    """Upper bound of o on [lo, hi]: dense-grid max + first-order slack."""
    xs = jnp.linspace(lo, hi, grid)
    vals = log_ratio(xs)
    slack = float(jnp.max(jnp.abs(jnp.diff(vals)))) if grid > 1 else 0.0
    return float(jnp.max(vals)) + slack


def _q_mass(lo, hi):
    from math import erf, sqrt

    def cdf(x):
        return 0.5 * (1.0 + erf((x - Q_LOC) / (Q_SCALE * sqrt(2.0))))

    return max(cdf(hi) - cdf(lo), 1e-300)


def _truncated_q(rng, lo, hi):
    from scipy.stats import truncnorm  # available via numpy stack

    a, b = (lo - Q_LOC) / Q_SCALE, (hi - Q_LOC) / Q_SCALE
    return float(truncnorm.rvs(a, b, loc=Q_LOC, scale=Q_SCALE,
                               random_state=rng))


def astar_sample(rng, lo=-30.0, hi=30.0, max_pops=200):
    """One exact sample from the MoG via A* search over the Gumbel process."""
    def gumbel(log_mass):
        return log_mass - math.log(-math.log(rng.uniform()))

    best_x, best_val = None, -np.inf
    g0 = gumbel(math.log(_q_mass(lo, hi)))
    frontier = [(-(g0 + _bound(lo, hi)), g0, lo, hi)]
    for _ in range(max_pops):
        neg_priority, g, a, b = heapq.heappop(frontier)
        if -neg_priority <= best_val:
            return best_x  # nothing on the frontier can win any more
        x = _truncated_q(rng, a, b)
        val = g + float(log_ratio(jnp.asarray(x)))
        if val > best_val:
            best_x, best_val = x, val
        # Split at the sampled point; each child's Gumbel maximum is a
        # Gumbel(log child-mass) truncated below the parent's realized max:
        # TruncGumbel(mu, b) = -log(exp(-Gumbel(mu)) + exp(-b)).
        for (ca, cb) in ((a, x), (x, b)):
            if cb - ca < 1e-9:
                continue
            raw = gumbel(math.log(_q_mass(ca, cb)))
            cg = -math.log(math.exp(-raw) + math.exp(-g))
            heapq.heappush(frontier, (-(cg + _bound(ca, cb)), cg, ca, cb))
        if not frontier:
            return best_x
    return best_x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    xs = np.array([astar_sample(rng) for _ in range(args.samples)])

    true_mean = float(np.sum(MOG_W * MOG_LOC))
    true_var = float(np.sum(MOG_W * (MOG_SCALE ** 2 + MOG_LOC ** 2))
                     - true_mean ** 2)
    se = math.sqrt(true_var / args.samples)
    print(f"A* samples: n={args.samples}  mean={xs.mean():+.3f} "
          f"(true {true_mean:+.3f}, se {se:.3f})  "
          f"var={xs.var():.3f} (true {true_var:.3f})")
    ok = abs(xs.mean() - true_mean) < 4 * se
    print(f"mean within 4 standard errors: {ok}")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
