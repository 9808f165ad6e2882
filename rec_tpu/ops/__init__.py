"""Pallas TPU kernels for the codec's hot ops."""

from .beam_score import score_candidates
from .mega_beam import mega_encode_blocks

__all__ = ["score_candidates", "mega_encode_blocks"]
