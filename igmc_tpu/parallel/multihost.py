"""Multi-host data feeding: per-process dataset shards + global batches.

The reference has no distributed sampler (it has no distributed anything —
SURVEY.md §2.3). On a multi-host TPU slice the recipe is:

    jax.distributed.initialize()
    mesh = make_mesh()                      # spans all hosts' devices
    idx = process_shard_indices(len(train_graphs))
    loader = BatchLoader(Subset(train_graphs, idx),
                         batch_size=B // jax.process_count(),
                         n_devices=jax.local_device_count(), device_put=False)
    for local in loader:
        batch = global_batch_from_local(local, mesh)   # one jax.Array/leaf
        state = step(state, batch)          # same jit as single-host

Every process feeds only its addressable shard; GSPMD's gradient psum spans
the whole mesh, so the math matches single-host training on the global
batch. All hosts get EQUAL step counts (wrapping pad) so collectives stay
aligned — a short final shard on one host would deadlock the others.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_shard_indices(
    n: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    seed: int = 0,
) -> np.ndarray:
    """Deterministic per-host partition of range(n).

    Every process receives exactly ceil(n / P) indices — the permutation
    wraps around to pad, so a few samples repeat rather than any host
    running fewer steps. Disjoint (up to the wrap pad) and covering.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n // pc)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    padded = np.concatenate([perm, perm[: per * pc - n]])
    return padded[pi * per : (pi + 1) * per]


class Subset:
    """Index-remapped view of a dataset (works for static and dynamic)."""

    def __init__(self, dataset, indices: np.ndarray):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def get(self, i: int):
        return self.dataset.get(int(self.indices[i]))

    def get_many(self, idxs):
        remapped = self.indices[np.asarray(idxs)]
        if hasattr(self.dataset, "get_many"):
            return self.dataset.get_many(remapped)
        return [self.dataset.get(int(i)) for i in remapped]

    def node_counts(self):
        return np.asarray(self.dataset.node_counts())[self.indices]

    def edge_counts(self):
        return np.asarray(self.dataset.edge_counts())[self.indices]


def global_batch_from_local(local_batch, mesh: Mesh):
    """Assemble a globally-sharded batch from this process's local stack.

    `local_batch` is a stacked GraphBatch whose leading axis covers this
    process's LOCAL devices; the result is one jax.Array per leaf, sharded
    over the mesh's 'data' axis across all hosts. On a single-process mesh
    this is equivalent to device_put with the same sharding.
    """
    shd = NamedSharding(mesh, P("data"))

    def put(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(shd, np.asarray(x))

    return jax.tree_util.tree_map(put, local_batch,
                                  is_leaf=lambda x: x is None)
