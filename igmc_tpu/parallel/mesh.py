"""Device mesh construction and sharding specs.

The reference is strictly single-GPU (SURVEY.md §2.3: no distributed
training of any kind). Here data parallelism is first-class: a 1-D
('data',) mesh shards the leading device axis of stacked graph batches;
parameters are replicated; GSPMD inserts the gradient psum. On multi-host
slices, call jax.distributed.initialize() before make_mesh() and the same
code spans ICI+DCN (each host feeds its own shard via its BatchLoader).

The mesh keeps a reserved 'model' axis (size 1 by default) so large
configurations can shard the relation-weight einsum without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """A ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (device) axis of stacked batches over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
