"""Device mesh helpers.

One 1-D "data" axis: the models are small (SURVEY.md §2.9), so throughput
scales data-parallel — images and latent blocks across chips, weights and
seeds replicated.  Multi-host initialization goes through
``jax.distributed.initialize`` (call ``init_distributed`` once per process
before any backend use).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op for single-process).

    When every process lives on one machine (a localhost coordinator), pin
    Gloo's CPU-collective sockets to the loopback interface: Gloo otherwise
    enumerates interfaces and can pick one whose pairwise TCP connects are
    unroutable (observed: a 4-process mesh hanging 300 s in "Gloo context
    initialization failed: Connect timeout" while 2 processes worked).  The
    coordinator address is the ground truth for which interface the job
    actually uses, so only the localhost case is pinned, and an explicit
    GLOO_SOCKET_IFNAME always wins.
    """
    if num_processes and num_processes > 1:
        host = (coordinator_address or "").rsplit(":", 1)[0]
        if host in ("localhost", "127.0.0.1", "::1"):
            os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
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
