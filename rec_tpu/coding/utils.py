"""Coding-layer errors and float-determinism helpers (ref rec/coding/utils.py)."""

import jax


class CodingError(Exception):
    """Raised on codec misconfiguration (KL overflow, bad buffers, ...)."""


def pin(x):
    """Pin a replay-critical value to its individually-rounded result.

    The codec is a deterministic-replay protocol: the decode-side float chain
    (aux-variance recursion, winner-row regeneration, sample accumulation)
    must produce bit-identical values in *every* program that embeds it — the
    standalone decoder, the encoder's embedded replay, and the models'
    in-graph compress/decompress.  XLA is otherwise free to FMA-contract,
    reassociate, or algebraically rewrite (e.g. square(sqrt(x)) -> x)
    differently depending on the surrounding graph.  Routing each step of the
    replay chain through ``optimization_barrier`` makes the chain an isolated
    island that compiles identically everywhere.  Costs are negligible: the
    replay path is O(D) per partition vs the O(B*S*D) selection path, which
    stays barrier-free (selection only picks indices; it cannot break
    bit-exactness).
    """
    return jax.lax.optimization_barrier(x)
