"""KL-partitioned coder driven by the rejection sampler
(ref GaussianCoder(sampler=RejectionSampler), rec/coding/coder.py:174 +
samplers.py:104-177; round-trip oracle ref test_coder.py:23-40).

The rejection sampler needs host-side f64 acceptance buffers per partition
(rejection.py), so this coder runs the partition chain as a host loop with
jitted device pieces — it is the compatibility path; the production
beam-search/importance coders are fully compiled.  Decode, however, is pure
index arithmetic on shared streams and stays jittable.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rng
from .gauss import (GaussianParams, auxiliary_target, conditional_coder,
                    conditional_target, kl_divergence)
from .partition import aux_variance_ratio
from .rejection import (RejectionSampler, RejectionSamplerConfig,
                        decode_rejection_sample)


@dataclasses.dataclass
class RejectionCoder:
    kl_per_partition: float = 3.0
    sampler_config: RejectionSamplerConfig = dataclasses.field(
        default_factory=RejectionSamplerConfig)
    aux_variance_ratios: Optional[Tuple[float, ...]] = None

    def __post_init__(self):
        self.sampler = RejectionSampler(self.sampler_config)

    def _ratio(self, i: int) -> float:
        if self.aux_variance_ratios is not None:
            if i >= len(self.aux_variance_ratios):
                from .utils import CodingError

                raise CodingError(
                    f"KL needs ratio index {i} but the learned table has "
                    f"only {len(self.aux_variance_ratios)} entries; refit "
                    "with higher-KL data or use extrapolation "
                    "(ref coder.py:226-230)")
            return float(self.aux_variance_ratios[i])
        return float(aux_variance_ratio(i))

    def encode_block(self, target: GaussianParams, coder: GaussianParams,
                     seed: int, update_sampler: bool = False
                     ) -> Tuple[List[int], jnp.ndarray]:
        """Partition chain with per-partition rejection coding (ref
        coder.py:493-559).  Returns (indices, sample)."""
        total_kl = float(jnp.sum(kl_divergence(target, coder)))
        n = max(int(np.ceil(total_kl / self.kl_per_partition)), 1)
        root = rng.root_key(seed)

        indices: List[int] = []
        for t in range(n):
            i = n - 1 - t
            ratio = self._ratio(i)
            aux_var = ratio * coder.var
            aux_t = auxiliary_target(target, coder, aux_var)
            aux_c = GaussianParams(jnp.zeros_like(coder.loc),
                                   jnp.sqrt(aux_var))
            key = rng.step_key(root, t)
            if update_sampler:
                self.sampler.update(aux_t, aux_c, key)
                aux_sample = aux_t.sample(jax.random.fold_in(key, 0xf1))
            else:
                index, aux_sample = self.sampler.coded_sample(aux_t, aux_c,
                                                              key)
                indices.append(index)
            target = conditional_target(target, coder, aux_var, aux_sample)
            coder = conditional_coder(coder, aux_var, aux_sample)

        return indices, coder.loc

    def decode_block(self, coder: GaussianParams, indices: List[int],
                     seed: int) -> jnp.ndarray:
        n = len(indices)
        root = rng.root_key(seed)
        for t, index in enumerate(indices):
            i = n - 1 - t
            ratio = self._ratio(i)
            aux_var = ratio * coder.var
            aux_scale = jnp.sqrt(aux_var)
            key = rng.step_key(root, t)
            eps = decode_rejection_sample(self.sampler.cfg, key, index,
                                          coder.loc.shape[-1])
            coder = conditional_coder(coder, aux_var, aux_scale * eps)
        return coder.loc

    def get_codelength(self, indices: List[int]) -> float:
        """Nats, from the fitted acceptance probabilities (ref
        samplers.py:149-157; requires update_sampler passes first)."""
        return sum(self.sampler.get_codelength(i) for i in indices)
