"""Relative entropy coding core (ref rec/coding/__init__.py:1-2)."""

from .coder import BeamSearchCoder, CodedLatent, GaussianCoder
from .gauss import GaussianParams, kl_divergence
from .rejection import RejectionSampler, RejectionSamplerConfig
from .rejection_coder import RejectionCoder
from .utils import CodingError

__all__ = [
    "BeamSearchCoder", "CodedLatent", "GaussianCoder", "GaussianParams",
    "RejectionCoder", "RejectionSampler", "RejectionSamplerConfig",
    "kl_divergence", "CodingError",
]
