"""Multi-host data feeding: per-process dataset shards + global batches.

The reference has no distributed sampler (it has no distributed anything —
SURVEY.md §2.3). On a multi-host TPU slice the recipe is:

    jax.distributed.initialize()
    mesh = make_mesh()                      # spans all hosts' devices
    idx = process_shard_indices(len(train_graphs))
    nl, el = capacity_ladders(train_graphs,           # FULL dataset, not the
                              B // jax.device_count())  # shard: same shapes
    loader = BatchLoader(Subset(train_graphs, idx),     # on every host
                         batch_size=B // jax.process_count(),
                         n_devices=jax.local_device_count(),
                         node_ladder=nl, edge_ladder=el, device_put=False)
    for local in loader:
        batch = global_batch_from_local(local, mesh)   # one jax.Array/leaf
        state = step(state, batch)          # same jit as single-host

Every process feeds only its addressable shard; GSPMD's gradient psum spans
the whole mesh, so the math matches single-host training on the global
batch. Two alignment rules, both load-bearing:

  * EQUAL STEP COUNTS — process_shard_indices pads by wrapping, so no host
    runs fewer steps (a short final shard would deadlock the collectives).
  * EQUAL SHAPES PER STEP — ladders estimated from a host's LOCAL shard
    would differ between hosts, making each process trace a different
    program for the same global step. capacity_ladders derives ONE
    fixed (node_pad, edge_pad) from the FULL dataset, identical
    everywhere (every host holds the whole dataset; only the feeding is
    sharded). Dynamic datasets have no precomputed counts — pass explicit
    identical node_ladder/edge_ladder on every host instead.
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


def capacity_ladders(dataset, batch_graphs: int):
    """Single-entry pad ladders from the FULL dataset's worst-case batch.

    Every host computes the identical (node_pad, edge_pad), so every batch
    on every host compiles to the same program — required for multi-host
    (see module docstring). Needs a dataset with precomputed counts
    (static); for dynamic datasets pass explicit ladders instead.
    """
    from ..batching.device_data import capacity_bound

    n_pad, e_pad = capacity_bound(np.asarray(dataset.node_counts()),
                                  np.asarray(dataset.edge_counts()),
                                  batch_graphs)
    return [n_pad], [e_pad]


def dynamic_capacity_ladders(dataset, batch_graphs: int, sample: int = 64,
                             margin: float = 1.0):
    """Identical-on-every-host pad ladders for DYNAMIC datasets.

    Dynamic datasets have no precomputed counts, and BatchLoader's local
    sampling estimate could diverge between hosts mid-run (its overflow
    extension mints new shapes per host — a multi-host deadlock). This
    helper derives ONE conservative (node_pad, edge_pad) bound that every
    host computes identically: extract a deterministic index sample
    (linspace over the FULL dataset — extraction is deterministic in the
    dataset index), take max-per-graph counts x batch_graphs x margin.
    That bound can only be beaten by a graph LARGER than every sampled
    one; margin > 1 buys headroom against that tail. Single-entry ladders:
    one compiled program per direction.
    """
    n = len(dataset)
    idx = np.linspace(0, n - 1, num=min(sample, n), dtype=np.int64)
    graphs = (dataset.get_many(idx) if hasattr(dataset, "get_many")
              else [dataset.get(int(i)) for i in idx])
    max_n = max(g.num_nodes for g in graphs)
    max_e = max(g.num_edges for g in graphs)
    pad = lambda v: int(-(-v * margin // 8) * 8)
    return [pad(max_n * batch_graphs)], [pad(max_e * batch_graphs)]


class Subset:
    """Index-remapped view of a dataset (works for static and dynamic).

    node_counts/edge_counts are exposed only when the wrapped dataset has
    them (static), so BatchLoader's hasattr-gated ladder estimation keeps
    working for dynamic datasets.
    """

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

    def __getattr__(self, name):
        # Conditional delegation: present iff the wrapped dataset has it.
        if name in ("node_counts", "edge_counts"):
            inner = getattr(self.dataset, name)  # AttributeError if absent
            idx = self.indices
            return lambda: np.asarray(inner())[idx]
        raise AttributeError(name)


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
