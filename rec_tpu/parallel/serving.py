"""Shared plumbing for data-parallel batch-serving CLIs
(examples/lossless/serve.py, examples/lossy/serve.py).

The serving pattern (SURVEY.md §2.9): every process holds the same full
batch from a deterministic loader; the batch axis shards over a (possibly
multi-process) 1-D mesh; each process serializes the images its devices
own.  No cross-image collectives anywhere.
"""

from __future__ import annotations

import jax
import numpy as np

from .mesh import data_axis_sharding


def global_batch_array(np_array, mesh):
    """Build a globally-sharded array from host-replicated numpy data.

    Every process holds the SAME full batch (the loaders are deterministic);
    the callback hands each device its slice, so no cross-host data motion
    happens — this is the multi-host generalization of ``jax.device_put``.
    """
    sharding = data_axis_sharding(mesh, np_array.ndim)
    return jax.make_array_from_callback(np_array.shape, sharding,
                                        lambda idx: np_array[idx])


def local_rows(arr) -> list:
    """(global_row, host_numpy_row) pairs owned by this process, ascending."""
    rows = {}
    for sh in arr.addressable_shards:
        sl = sh.index[0]
        data = np.asarray(sh.data)
        start = sl.start or 0
        for k in range(data.shape[0]):
            rows[start + k] = data[k]
    return sorted(rows.items())
