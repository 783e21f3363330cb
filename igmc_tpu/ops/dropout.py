"""Dropout ops: masked adjacency (edge) dropout and feature dropout.

Edge dropout replaces PyG's dropout_adj (/root/reference/models.py:193-198):
instead of filtering the edge list (a dynamic shape), we AND a Bernoulli keep
mask into the static edge mask. `force_undirected` draws one Bernoulli per
undirected pair: the batch layout stores `edge_canon[e]` = index of e's
forward copy, so gathering the mask at `edge_canon` ties (u,v) and (v,u)
together — the same semantics as dropout_adj(force_undirected=True), which
masks the upper-triangular half and mirrors it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edge_dropout(key, edge_mask, edge_canon, p: float, force_undirected: bool,
                 training: bool = True):
    """Return edge_mask with edges dropped independently with prob `p`."""
    if not training or p == 0.0:
        return edge_mask
    keep = jax.random.bernoulli(key, 1.0 - p, edge_mask.shape)
    if force_undirected:
        keep = keep[edge_canon]
    return jnp.logical_and(edge_mask, keep)


def edge_dropout_dense(key, edge_mask, p: float, force_undirected: bool,
                       training: bool = True):
    """Edge dropout for dense-blocked batches (batching/dense.py), where
    each edge is stored ONCE (forward) and applied in both directions.

    Returns (mask_fwd, mask_rev). force_undirected draws one Bernoulli per
    stored edge shared by both directions (dropout_adj(force_undirected=True)
    semantics); otherwise each direction keeps independently, matching the
    flat layout where the two directed copies are independent edges.
    """
    if not training or p == 0.0:
        return edge_mask, edge_mask
    if force_undirected:
        keep = jax.random.bernoulli(key, 1.0 - p, edge_mask.shape)
        m = jnp.logical_and(edge_mask, keep)
        return m, m
    kf, kr = jax.random.split(key)
    keep_f = jax.random.bernoulli(kf, 1.0 - p, edge_mask.shape)
    keep_r = jax.random.bernoulli(kr, 1.0 - p, edge_mask.shape)
    return (jnp.logical_and(edge_mask, keep_f),
            jnp.logical_and(edge_mask, keep_r))


def feature_dropout(key, x, p: float, training: bool = True):
    """Standard inverted dropout (matches F.dropout)."""
    if not training or p == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)
