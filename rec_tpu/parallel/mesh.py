"""Device mesh helpers.

One 1-D "data" axis: the models are small (SURVEY.md §2.9), so throughput
scales data-parallel — images and latent blocks across chips, weights and
seeds replicated.  Multi-host initialization goes through
``jax.distributed.initialize`` (call ``init_distributed`` once per process
before any backend use).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op for single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_axis_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS
                       ) -> NamedSharding:
    """Shard the leading axis over the mesh, replicate the rest."""
    return NamedSharding(mesh, PartitionSpec(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
