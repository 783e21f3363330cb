"""Segmented SortPooling (DGCNN readout) over padded disjoint batch-graphs.

Parity target: PyG global_sort_pool (/root/reference/models.py:108,:155) —
per graph, sort nodes descending by the last feature channel, keep the top k
(zero-padding graphs with fewer than k nodes), and flatten to [B, k*D].

TPU-shaped implementation: one global lexicographic sort by
(graph_id, -last_channel) puts every graph's nodes contiguously in rank
order; a cumulative-count gather then pulls each graph's first k rows.
No per-graph loops, fully static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def global_sort_pool(x, node2graph, node_mask, num_graphs: int, k: int):
    """x: [N, D] node features; returns [B, k*D]."""
    N, D = x.shape
    key_feat = x[:, -1]
    # Push padded nodes to the very end of every segment and after all graphs.
    gid = jnp.where(node_mask, node2graph, num_graphs)
    order = jnp.lexsort((-key_feat, gid))  # primary: graph id, secondary: desc feat
    x_sorted = x[order]
    gid_sorted = gid[order]

    # Start offset of each graph in the sorted order.
    counts = jnp.bincount(gid, length=num_graphs + 1)[:num_graphs]
    starts = jnp.cumsum(counts) - counts  # [B]

    # Gather indices [B, k]: starts[b] + j, masked where j >= counts[b].
    j = jnp.arange(k)[None, :]
    idx = starts[:, None] + j
    valid = j < counts[:, None]
    idx = jnp.clip(idx, 0, N - 1)
    pooled = x_sorted[idx]  # [B, k, D]
    pooled = jnp.where(valid[:, :, None], pooled, 0.0)
    # Guard against gathering rows of other graphs when counts[b]==0.
    same_graph = gid_sorted[idx] == jnp.arange(num_graphs)[:, None]
    pooled = jnp.where(same_graph[:, :, None], pooled, 0.0)
    return pooled.reshape(num_graphs, k * D)
