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


def dense_sort_pool(x, node_mask, k: int):
    """SortPooling over the dense-blocked layout: x [B, n, D] node slots.

    Same semantics as global_sort_pool (PyG global_sort_pool parity): per
    graph, nodes sorted descending by the last feature channel (stable —
    ties resolve in node-slot order, matching the flat path's stable
    lexsort), top k kept, short graphs zero-padded. A per-slot top-k is a
    batched argsort + take_along_axis — no segment ops.
    """
    B, n, D = x.shape
    keys = jnp.where(node_mask, x[..., -1], -jnp.inf)
    kk = min(k, n)
    idx = jnp.argsort(-keys, axis=1, stable=True)[:, :kk]     # [B, kk]
    pooled = jnp.take_along_axis(x, idx[..., None], axis=1)   # [B, kk, D]
    valid = jnp.take_along_axis(node_mask, idx, axis=1)
    pooled = jnp.where(valid[..., None], pooled, 0.0)
    if kk < k:  # node slot smaller than k: zero-pad the tail rows
        pooled = jnp.concatenate(
            [pooled, jnp.zeros((B, k - kk, D), pooled.dtype)], axis=1)
    return pooled.reshape(B, k * D)
