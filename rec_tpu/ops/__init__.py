"""Pallas TPU kernels for the codec's hot ops."""

from .beam_score import score_candidates

__all__ = ["score_candidates"]
