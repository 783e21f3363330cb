"""Masked segment reductions — the aggregation substrate for message passing.

These replace torch_scatter's CUDA scatter kernels (used inside PyG's
MessagePassing at /root/reference/models.py:201). On TPU, scatter-add lowers
to an XLA scatter — the production path (XLA's gather/scatter emitters beat
anything expressible in Pallas on this stack; see kernels/README.md). A
fused Pallas alternative for the R-GCN aggregate lives in
kernels/rgcn_aggregate.py.

All reductions are padding-safe: contributions are gated by a mask, so
padded edges/nodes never pollute real rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def masked_segment_sum(data, segment_ids, mask, num_segments: int):
    """Sum `data[e]` into row `segment_ids[e]` where mask[e]; zeros elsewhere."""
    m = mask.astype(data.dtype)
    if data.ndim > 1:
        m = m.reshape((-1,) + (1,) * (data.ndim - 1))
    return jax.ops.segment_sum(data * m, segment_ids, num_segments=num_segments)


def masked_segment_mean(data, segment_ids, mask, num_segments: int):
    """Mean of `data` per segment counting only unmasked entries.

    Segments with zero unmasked entries get 0 — matching scatter-mean
    semantics of the reference's R-GCN aggregation (PyG 1.4.2 RGCNConv uses
    aggr='mean' over all incoming edges).
    """
    s = masked_segment_sum(data, segment_ids, mask, num_segments)
    cnt = jax.ops.segment_sum(
        mask.astype(data.dtype), segment_ids, num_segments=num_segments
    )
    denom = jnp.maximum(cnt, 1.0)
    return s / denom.reshape((-1,) + (1,) * (data.ndim - 1))
