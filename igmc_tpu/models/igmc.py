"""The IGMC model family as functional JAX models over padded graph batches.

Parity targets (/root/reference/models.py):
  * IGMC     (:170-217) — 4x basis-RGCN + tanh, layer-concat, TARGET-node
    readout (target user ++ target item states), optional side features,
    MLP 2*sum(latent)->128->1 with 0.5 dropout, output scaled by multiply_by.
  * GNN      (:13-60)  — GCN trunk + global_add_pool readout (base class).
  * DGCNN    (:63-120) — GCN trunk + SortPooling + 1D convs (AAAI'18).
  * DGCNN_RS (:123-167) — DGCNN with RGCN trunk.

Design notes (TPU-first, not a translation):
  * The reference finds target nodes by scanning x[:,0]==1 / x[:,1]==1
    (/root/reference/models.py:205-207); we carry explicit target indices in
    the batch and gather — no boolean compaction, static shapes.
  * Edge dropout operates on the static edge mask (ops/dropout.py).
  * The reference GNN/DGCNN base forwards crash with a NameError when
    adj_dropout > 0 (undefined `edge_type`, /root/reference/models.py:39-44);
    we implement the intended behavior (documented divergence).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..batching.batch import GraphBatch
from ..batching.dense import DenseBatch
from ..ops.dropout import edge_dropout, edge_dropout_dense, feature_dropout
from ..ops.segment import masked_segment_sum
from ..ops.sort_pool import dense_sort_pool, global_sort_pool
from .rgcn import (
    gcn_apply, gcn_init, linear_apply, linear_init, rgcn_apply, rgcn_init,
    rgcn_relation_weights, _uniform,
)


# ---------------------------------------------------------------------------
# IGMC
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class IGMCConfig:
    num_features: int = 4                  # 2h + 2 one-hot node-label dim
    latent_dim: Tuple[int, ...] = (32, 32, 32, 32)
    num_relations: int = 5
    num_bases: int = 4
    adj_dropout: float = 0.2
    force_undirected: bool = False
    side_features: bool = False
    n_side_features: int = 0
    multiply_by: float = 1.0
    conv_strategy: str = "auto"            # rgcn compute strategy
    # Dense-layout aggregation strategy: 'edge' = per-edge one-hot matmuls
    # (rgcn_dense_apply), 'adjacency' = per-relation [B,R,n,n] adjacency
    # built once per forward and shared by all layers (rgcn_dense_adj_apply;
    # fewer MACs on paper but MEASURED 2.4-5x slower on v5e at every IGMC
    # shape — the [B,R,n,n] tensors are HBM-bound while XLA keeps the edge
    # path's [B,E,*] intermediates fused on-chip). 'auto' therefore = edge.
    dense_strategy: str = "auto"
    dense_adj_max_bytes: int = 128 * 1024 * 1024
    aggr: str = "mean"                     # rgcn aggregation (mean/sum/relmean)
    compute_dtype: Optional[str] = None    # e.g. "bfloat16" for the trunk
    use_pallas: bool = False               # fused Pallas aggregate (see kernels/)
    pallas_rows: int = 256                 # output-chunk rows of the kernel
    pallas_interpret: bool = False         # interpreter mode (CPU tests)
    # Flat-layout aggregation engine: 'segment' = XLA gather/scatter (best
    # while the batch fits VMEM), 'blocked' = dst/src-blocked one-hot
    # matmuls, scatter-free fwd AND bwd (ops/blocked.py — the HBM-resident
    # giant-batch path; needs batch.blocked plans), 'pallas' = the fused
    # kernel via `aligned` (inference). See kernels/README.md.
    flat_aggregate: str = "segment"


def igmc_init(key, cfg: IGMCConfig):
    keys = jax.random.split(key, len(cfg.latent_dim) + 2)
    convs = []
    in_dim = cfg.num_features
    for i, out_dim in enumerate(cfg.latent_dim):
        convs.append(
            rgcn_init(keys[i], in_dim, out_dim, cfg.num_relations, cfg.num_bases)
        )
        in_dim = out_dim
    lin1_in = 2 * sum(cfg.latent_dim) + (
        cfg.n_side_features if cfg.side_features else 0
    )
    return {
        "convs": convs,
        "lin1": linear_init(keys[-2], lin1_in, 128),
        "lin2": linear_init(keys[-1], 128, 1),
    }


def igmc_forward(params, batch: GraphBatch, cfg: IGMCConfig,
                 key=None, training: bool = False, aligned=None):
    """Predict a rating per graph in the batch. Returns [B] float32.

    `aligned`: optional dst-block-aligned edge arrays from
    `kernels.rgcn_aggregate.block_align_edges` (device tuple). With
    `cfg.use_pallas` set, the R-GCN aggregate of every layer runs as the
    fused Pallas kernel instead of the XLA strategy (measured full-model
    comparison: kernels/README.md). The aligned mask is fixed host-side,
    so edge dropout is unsupported on this path.

    Accepts either batch layout: a flat GraphBatch (disjoint edge list,
    segment aggregation) or a DenseBatch (per-graph node slots, batched
    one-hot matmul aggregation — the fast TPU path, batching/dense.py).
    """
    if isinstance(batch, DenseBatch):
        return _igmc_forward_dense(params, batch, cfg, key, training)
    N = batch.node_label.shape[0]
    x = jax.nn.one_hot(batch.node_label, cfg.num_features, dtype=jnp.float32)
    x = x * batch.node_mask[:, None].astype(jnp.float32)

    blocked = getattr(batch, "blocked", None)
    use_blocked = cfg.flat_aggregate == "blocked"
    if use_blocked and blocked is None:
        raise ValueError(
            "flat_aggregate='blocked' needs dst/src-blocked plans on the "
            "batch (BatchLoader(flat_aggregate='blocked') or "
            "ops.plan_blocked_edges)")
    if use_blocked:
        return _igmc_forward_blocked(params, batch, blocked, cfg, key,
                                     training)

    if aligned is None:
        aligned = getattr(batch, "aligned", None)
    aligned_t = getattr(batch, "aligned_t", None)
    emask = batch.edge_mask
    if training and cfg.adj_dropout > 0:
        if cfg.use_pallas and aligned is not None:
            # Recompute the aligned mask on device: the keep decision is
            # the stateless hash of (seed, directed-edge key) — the same
            # convention as the blocked engine (ops/blocked.dropout_masks)
            # — so no host-side re-alignment per step is needed. Requires
            # block_align_edges(edge_canon=...) to have carried ukey.
            if len(aligned) < 7 or aligned[6] is None:
                raise NotImplementedError(
                    "use_pallas + adj_dropout needs the aligned ukey "
                    "stream: build plans with block_align_edges("
                    "edge_canon=batch.edge_canon) (BatchLoader does)")
            from ..parallel.ep import hash_edge_keep

            key, k_edge = jax.random.split(key)
            seed = jax.random.randint(
                k_edge, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
            ukey = aligned[6]
            key_ids = ukey // 2 if cfg.force_undirected else ukey
            keep = hash_edge_keep(seed, key_ids, cfg.adj_dropout)
            amask_dropped = aligned[3] * keep.astype(aligned[3].dtype)
            aligned = aligned[:3] + (amask_dropped,) + aligned[4:]
            if aligned_t is not None:
                # the src-sorted twin plan must drop the SAME edges: its
                # ukey stream keys the original orientation, so the same
                # stateless hash reproduces the identical keep decisions
                if len(aligned_t) < 7 or aligned_t[6] is None:
                    raise NotImplementedError(
                        "use_pallas training + adj_dropout needs the "
                        "transposed plan's ukey stream "
                        "(block_align_edges_transposed with edge_canon)")
                ukey_t = aligned_t[6]
                kt = ukey_t // 2 if cfg.force_undirected else ukey_t
                keep_t = hash_edge_keep(seed, kt, cfg.adj_dropout)
                mt = aligned_t[3] * keep_t.astype(aligned_t[3].dtype)
                aligned_t = aligned_t[:3] + (mt,) + aligned_t[4:]
        else:
            key, k_edge = jax.random.split(key)
            emask = edge_dropout(k_edge, emask, batch.edge_canon,
                                 cfg.adj_dropout, cfg.force_undirected,
                                 training)

    pallas = cfg.use_pallas and aligned is not None
    if pallas:
        from ..kernels.rgcn_aggregate import (_dst_global,
                                              rgcn_aggregate_pallas,
                                              rgcn_aggregate_pallas_train)

        if cfg.aggr not in ("mean", "sum"):
            raise NotImplementedError(f"use_pallas + aggr={cfg.aggr}")
        amask = aligned[3]
        dst_glob = _dst_global(aligned, cfg.pallas_rows)
        deg = jax.ops.segment_sum(amask, dst_glob, num_segments=N)
        inv_deg = (1.0 / jnp.maximum(deg, 1.0))[:, None]

    # CPU backends (tests, virtual meshes) run the kernel in interpreter
    # mode automatically — Mosaic only lowers for TPU.
    interpret = cfg.pallas_interpret or (
        pallas and jax.default_backend() == "cpu")
    states = []
    for conv_params in params["convs"]:
        if pallas:
            if aligned_t is not None:
                # src-sorted twin plan present: the backward dx runs as the
                # same Pallas indicator-matmul kernel (training win;
                # kernels/README.md round-5)
                agg = rgcn_aggregate_pallas_train(
                    x, conv_params["att"], conv_params["basis"], aligned,
                    aligned_t[:6], cfg.pallas_rows, N, interpret)
            else:
                agg = rgcn_aggregate_pallas(
                    x, conv_params["att"], conv_params["basis"], aligned,
                    cfg.pallas_rows, N, interpret)
            if cfg.aggr == "mean":
                agg = agg * inv_deg
            x = jnp.tanh(agg + x @ conv_params["root"] + conv_params["bias"])
        else:
            x = jnp.tanh(
                rgcn_apply(conv_params, x, batch.edge_src, batch.edge_dst,
                           batch.edge_type, emask, N, cfg.conv_strategy, cfg.aggr,
                           jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None)
            )
        states.append(x)
    concat_states = jnp.concatenate(states, axis=1)  # [N, sum(latent)]

    h_u = concat_states[batch.target_u]  # [B, sum]
    h_v = concat_states[batch.target_v]
    h = jnp.concatenate([h_u, h_v], axis=1)  # [B, 2*sum]
    if cfg.side_features:
        h = jnp.concatenate([h, batch.u_feat, batch.v_feat], axis=1)

    h = jax.nn.relu(linear_apply(params["lin1"], h))
    if training:
        key, k_drop = jax.random.split(key)
        h = feature_dropout(k_drop, h, 0.5, training)
    out = linear_apply(params["lin2"], h)[:, 0]
    return out * cfg.multiply_by


def _igmc_forward_blocked(params, batch: GraphBatch, blocked,
                          cfg: IGMCConfig, key=None,
                          training: bool = False):
    """IGMC forward with the scatter-free blocked R-GCN aggregate
    (ops/blocked.py): same math as the segment path to float tolerance
    (tests/test_blocked.py), but the per-layer aggregation (and its
    backward) runs as MXU indicator matmuls — the HBM-resident giant-batch
    path. Edge dropout is the stateless hash stream over the plans' edge
    ids, so training works without host-side mask re-alignment."""
    from ..ops.blocked import (blocked_degree, blocked_rel_counts,
                               blocked_rgcn_aggregate, dropout_masks,
                               relmean_weights)

    if cfg.aggr not in ("mean", "sum", "relmean"):
        raise NotImplementedError(
            f"flat_aggregate='blocked': unknown aggr {cfg.aggr}")
    N = batch.node_label.shape[0]
    x = jax.nn.one_hot(batch.node_label, cfg.num_features, dtype=jnp.float32)
    x = x * batch.node_mask[:, None].astype(jnp.float32)

    masks = (blocked.fwd.mask, blocked.bwd.mask)
    if training and cfg.adj_dropout > 0:
        key, k_edge = jax.random.split(key)
        seed = jax.random.randint(k_edge, (), 0, jnp.iinfo(jnp.int32).max
                                  ).astype(jnp.uint32)
        masks = dropout_masks(blocked, cfg.adj_dropout,
                              cfg.force_undirected, seed)
    inv_deg = None
    if cfg.aggr == "mean":
        deg = blocked_degree(blocked.fwd, masks[0], blocked.rows, N)
        inv_deg = (1.0 / jnp.maximum(deg, 1.0))[:, None]
    elif cfg.aggr == "relmean":
        # Schlichtkrull 1/c_{i,r}: fold the inverse (dst, relation) counts
        # into the per-edge weights (relmean = weighted sum); counts are
        # mask-dependent, so this happens after dropout, once per forward.
        R = cfg.num_relations
        cnt = blocked_rel_counts(blocked.fwd, masks[0], R, blocked.rows, N)
        cinv = (1.0 / jnp.maximum(cnt, 1.0)).reshape(-1)
        masks = (relmean_weights(cinv, blocked.fwd, masks[0], R,
                                 blocked.rows, True),
                 relmean_weights(cinv, blocked.bwd, masks[1], R,
                                 blocked.rows, False))

    cd = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    states = []
    for conv in params["convs"]:
        agg = blocked_rgcn_aggregate(x, conv["att"], conv["basis"], blocked,
                                     masks, blocked.rows, N, blocked.group,
                                     None, None, cd)
        if cfg.aggr == "mean":
            agg = agg * inv_deg
        x = jnp.tanh(agg + x @ conv["root"] + conv["bias"])
        states.append(x)
    concat_states = jnp.concatenate(states, axis=1)

    h_u = concat_states[batch.target_u]
    h_v = concat_states[batch.target_v]
    h = jnp.concatenate([h_u, h_v], axis=1)
    if cfg.side_features:
        h = jnp.concatenate([h, batch.u_feat, batch.v_feat], axis=1)
    h = jax.nn.relu(linear_apply(params["lin1"], h))
    if training:
        key, k_drop = jax.random.split(key)
        h = feature_dropout(k_drop, h, 0.5, training)
    out = linear_apply(params["lin2"], h)[:, 0]
    return out * cfg.multiply_by


def _igmc_forward_dense(params, batch: DenseBatch, cfg: IGMCConfig,
                        key=None, training: bool = False):
    """IGMC forward over the dense-blocked layout: [B, n, C] node states,
    rgcn_dense_apply trunk (all-MXU aggregation), target readout as the
    fixed slices rows 0/1 (batching/dense.py invariant). Same math as the
    flat path to float tolerance (tests/test_dense.py)."""
    from .rgcn import (build_dense_adj, dense_adj_degrees, rgcn_dense_apply,
                       rgcn_dense_adj_apply, rgcn_dense_bipartite_apply)

    x = jax.nn.one_hot(batch.node_label, cfg.num_features, dtype=jnp.float32)
    x = x * batch.node_mask[..., None].astype(jnp.float32)

    mask_f = mask_r = batch.edge_mask
    if training and cfg.adj_dropout > 0:
        key, k_edge = jax.random.split(key)
        mask_f, mask_r = edge_dropout_dense(
            k_edge, batch.edge_mask, cfg.adj_dropout, cfg.force_undirected,
            training)

    cd = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    B, n = batch.node_label.shape
    # 'auto' resolves to the edge formulation: measured 2.4-5x faster than
    # 'adjacency' on v5e at r5/flixster/r71/yahoo shapes (2026-08-17; see
    # IGMCConfig.dense_strategy). The adjacency path stays available for
    # explicit study and for shapes where E/n grows far beyond IGMC's.
    use_adj = cfg.dense_strategy == "adjacency"
    if batch.num_u is not None or batch.rel_caps is not None:
        from .rgcn import rgcn_dense_relslot_apply

        if use_adj:
            raise NotImplementedError(
                "dense_strategy='adjacency' is unified-layout only; the "
                "bipartite/relslot layouts' cheaper one-hot work "
                "supersedes it")
        # BIPARTITE node slots (per-side one-hot widths, targets at rows
        # 0 / num_u) and/or RELATION-SLOTTED edges (no rel one-hot, no
        # [B,E,nb*C] outer product) — see batching/dense.py DenseBatch.
        # Readout slices per layer (targets only), as the unified branch.
        t_row = 1 if batch.num_u is None else batch.num_u
        t_states = []
        for conv_params in params["convs"]:
            if batch.rel_caps is not None:
                h = rgcn_dense_relslot_apply(
                    conv_params, x, batch.edge_src, batch.edge_dst,
                    batch.rel_caps, mask_f, mask_r, cfg.aggr, cd,
                    num_u=batch.num_u)
            else:
                h = rgcn_dense_bipartite_apply(
                    conv_params, x, batch.num_u, batch.edge_src,
                    batch.edge_dst, batch.edge_type, mask_f, mask_r,
                    cfg.aggr, cd)
            x = jnp.tanh(h)
            t_states.append(
                jnp.stack([x[:, 0, :], x[:, t_row, :]], axis=1))
        ts = jnp.concatenate(t_states, axis=-1)  # [B, 2, sum(latent)]
        h = jnp.concatenate([ts[:, 0, :], ts[:, 1, :]], axis=-1)
        if cfg.side_features:
            h = jnp.concatenate([h, batch.u_feat, batch.v_feat], axis=-1)
        h = jax.nn.relu(linear_apply(params["lin1"], h))
        if training:
            key, k_drop = jax.random.split(key)
            h = feature_dropout(k_drop, h, 0.5, training)
        out = linear_apply(params["lin2"], h)[:, 0]
        return out * cfg.multiply_by
    if use_adj:
        # A is layer- and width-independent: one O(E)-cost build feeds all
        # layers (rgcn.build_dense_adj). Masks tied across directions
        # (no dropout, or force_undirected) share one adjacency.
        adj_f = build_dense_adj(batch.edge_src, batch.edge_dst,
                                batch.edge_type, mask_f,
                                cfg.num_relations, n, cd)
        adj_r = None if mask_r is mask_f else build_dense_adj(
            batch.edge_src, batch.edge_dst, batch.edge_type, mask_r,
            cfg.num_relations, n, cd)
        inv_deg = (dense_adj_degrees(adj_f, adj_r)
                   if cfg.aggr == "mean" else None)

    # IGMC's readout touches ONLY the two target rows, so collect the
    # per-layer target slices instead of concatenating full [B, n, sum]
    # states (the concat's layout copies were ~8% of the dense forward in
    # the round-5 xplane profile).
    t_states = []
    for conv_params in params["convs"]:
        if use_adj:
            h = rgcn_dense_adj_apply(conv_params, x, adj_f, adj_r,
                                     cfg.aggr, cd, inv_deg)
        else:
            h = rgcn_dense_apply(conv_params, x, batch.edge_src,
                                 batch.edge_dst, batch.edge_type,
                                 mask_f, mask_r, cfg.aggr, cd,
                                 per_basis=cfg.dense_strategy == "edge-k")
        x = jnp.tanh(h)
        t_states.append(x[:, :2, :])  # rows 0 (user) and 1 (item)

    ts = jnp.concatenate(t_states, axis=-1)  # [B, 2, sum(latent)]
    h = jnp.concatenate([ts[:, 0, :], ts[:, 1, :]], axis=-1)
    if cfg.side_features:
        h = jnp.concatenate([h, batch.u_feat, batch.v_feat], axis=-1)

    h = jax.nn.relu(linear_apply(params["lin1"], h))
    if training:
        key, k_drop = jax.random.split(key)
        h = feature_dropout(k_drop, h, 0.5, training)
    out = linear_apply(params["lin2"], h)[:, 0]
    return out * cfg.multiply_by


def chunk_dense_batch(batch: DenseBatch, chunk: int) -> DenseBatch:
    """Reshape a giant DenseBatch [B, ...] into scan stacks [K, chunk, ...].

    The HBM-resident giant-batch discipline: IGMC giant batches are
    disjoint unions of small subgraphs, so the whole forward is per-graph
    independent and can stream through the chip chunk by chunk — each
    chunk's layer intermediates ([chunk, E, nb*C] messages etc.) live and
    die in VMEM and never round-trip HBM, unlike one monolithic [B, E, *]
    program. Measured on v5e at (B=4096, n=64, ~1.9M real edges): ~3x the
    monolithic dense forward, ~70x the flat blocked one-hot engine and
    >100x the flat segment path (bench.py hbm_resident_r5*)."""
    if batch.stacked is not None:
        raise ValueError(
            f"chunk_dense_batch needs an unstacked batch whose leading axis "
            f"is the graph axis; got stacked={batch.stacked!r} — chunking "
            f"would silently slice the {batch.stacked} axis instead")
    if batch.num_graphs % chunk != 0:
        raise ValueError(f"num_graphs {batch.num_graphs} % chunk {chunk}")
    K = batch.num_graphs // chunk

    def r(a):
        return a.reshape((K, chunk) + a.shape[1:])

    out = jax.tree_util.tree_map(r, batch)
    out.stacked = "chunked"
    return out


def igmc_forward_dense_chunked(params, batch: DenseBatch, cfg: IGMCConfig,
                               chunk: int, key=None,
                               training: bool = False):
    """igmc_forward over a giant DenseBatch, lax.scan'ed in graph chunks.

    Numerically identical to the monolithic forward except for dropout
    stream assignment (per-chunk fold_in keys); see chunk_dense_batch for
    why this is the HBM-resident formulation. Returns [B] predictions."""
    stacked = chunk_dense_batch(batch, chunk)
    K = batch.num_graphs // chunk
    kk = key if key is not None else jax.random.PRNGKey(0)

    def body(_, xs):
        b, i = xs
        preds = igmc_forward(params, b, cfg, jax.random.fold_in(kk, i),
                             training)
        return None, preds

    _, preds = jax.lax.scan(body, None, (stacked, jnp.arange(K)))
    return preds.reshape(-1)


def arr_regularizer(params):
    """Adjacent-rating regularizer: sum over layers of ||W_{r+1} - W_r||^2.

    Reads (att, basis) exactly as /root/reference/train_eval.py:167-174.
    Non-relational convs (GCN trunks of GNN/DGCNN) carry no relation
    weights and contribute nothing — the reference would crash there
    (models.py:39-44 dead paths); we skip instead.
    """
    reg = 0.0
    for conv_params in params["convs"]:
        if "att" not in conv_params or "basis" not in conv_params:
            continue
        w = rgcn_relation_weights(conv_params)  # [R, in, out]
        reg = reg + jnp.sum((w[1:] - w[:-1]) ** 2)
    return reg


# ---------------------------------------------------------------------------
# GNN (GCN trunk + sum pool)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GNNConfig:
    num_features: int = 4
    latent_dim: Tuple[int, ...] = (32, 32, 32, 1)
    adj_dropout: float = 0.2
    force_undirected: bool = False
    regression: bool = True
    num_classes: int = 1


def gnn_init(key, cfg: GNNConfig):
    keys = jax.random.split(key, len(cfg.latent_dim) + 2)
    convs = []
    in_dim = cfg.num_features
    for i, out_dim in enumerate(cfg.latent_dim):
        convs.append(gcn_init(keys[i], in_dim, out_dim))
        in_dim = out_dim
    out_dim_head = 1 if cfg.regression else cfg.num_classes
    return {
        "convs": convs,
        "lin1": linear_init(keys[-2], sum(cfg.latent_dim), 128),
        "lin2": linear_init(keys[-1], 128, out_dim_head),
    }


def _gcn_trunk(conv_params_list, batch, emask, num_features):
    N = batch.node_label.shape[0]
    x = jax.nn.one_hot(batch.node_label, num_features, dtype=jnp.float32)
    x = x * batch.node_mask[:, None].astype(jnp.float32)
    states = []
    for conv_params in conv_params_list:
        x = jnp.tanh(
            gcn_apply(conv_params, x, batch.edge_src, batch.edge_dst,
                      emask, batch.node_mask, N)
        )
        states.append(x)
    return jnp.concatenate(states, axis=1)


def _gcn_trunk_dense(conv_params_list, batch: DenseBatch, cfg, key,
                     training: bool):
    """GCN trunk over the dense-blocked layout ([B, n, C] slots); returns
    the layer-concat states [B, n, sum(latent)]."""
    from .rgcn import gcn_dense_apply

    mask_f = mask_r = batch.edge_mask
    if training and cfg.adj_dropout > 0:
        key, k_edge = jax.random.split(key)
        mask_f, mask_r = edge_dropout_dense(
            k_edge, batch.edge_mask, cfg.adj_dropout, cfg.force_undirected,
            training)
    x = jax.nn.one_hot(batch.node_label, cfg.num_features, dtype=jnp.float32)
    x = x * batch.node_mask[..., None].astype(jnp.float32)
    states = []
    for conv_params in conv_params_list:
        x = jnp.tanh(gcn_dense_apply(conv_params, x, batch.edge_src,
                                     batch.edge_dst, mask_f, mask_r,
                                     batch.node_mask))
        states.append(x)
    return jnp.concatenate(states, axis=-1), key


def gnn_forward(params, batch, cfg: GNNConfig,
                key=None, training: bool = False):
    if isinstance(batch, DenseBatch):
        concat_states, key = _gcn_trunk_dense(params["convs"], batch, cfg,
                                              key, training)
        pooled = jnp.sum(
            concat_states * batch.node_mask[..., None].astype(jnp.float32),
            axis=1)  # global_add_pool over node slots
    else:
        emask = batch.edge_mask
        if training and cfg.adj_dropout > 0:
            key, k_edge = jax.random.split(key)
            emask = edge_dropout(k_edge, emask, batch.edge_canon,
                                 cfg.adj_dropout, cfg.force_undirected,
                                 training)
        concat_states = _gcn_trunk(params["convs"], batch, emask,
                                   cfg.num_features)
        pooled = masked_segment_sum(
            concat_states, batch.node2graph, batch.node_mask,
            batch.num_graphs
        )
    h = jax.nn.relu(linear_apply(params["lin1"], pooled))
    if training:
        key, k_drop = jax.random.split(key)
        h = feature_dropout(k_drop, h, 0.5, training)
    out = linear_apply(params["lin2"], h)
    if cfg.regression:
        return out[:, 0]
    return jax.nn.log_softmax(out, axis=-1)


# ---------------------------------------------------------------------------
# DGCNN / DGCNN_RS (SortPool + 1D convs)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DGCNNConfig:
    num_features: int = 4
    latent_dim: Tuple[int, ...] = (32, 32, 32, 1)
    k: int = 30
    adj_dropout: float = 0.2
    force_undirected: bool = False
    regression: bool = True
    num_classes: int = 1
    # RS variant (relational trunk):
    relational: bool = False
    num_relations: int = 5
    num_bases: int = 2
    conv1d_channels: Tuple[int, int] = (16, 32)
    conv1d_kw2: int = 5

    @property
    def total_latent_dim(self) -> int:
        return sum(self.latent_dim)

    @property
    def dense_dim(self) -> int:
        d = int((self.k - 2) / 2 + 1)
        return (d - self.conv1d_kw2 + 1) * self.conv1d_channels[1]


def sortpool_k_from_dataset(node_counts, k_fraction: float) -> int:
    """Transform a percentile k in (0,1) to a node count (>= 10), as the
    reference does from the dataset (/root/reference/models.py:70-74)."""
    node_nums = sorted(int(n) for n in node_counts)
    k = node_nums[int(math.ceil(k_fraction * len(node_nums))) - 1]
    return max(10, k)


def _conv1d_init(key, in_ch, out_ch, kernel):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel)
    return {
        "weight": _uniform(k1, (out_ch, in_ch, kernel), bound),
        "bias": _uniform(k2, (out_ch,), bound),
    }


def dgcnn_init(key, cfg: DGCNNConfig):
    keys = jax.random.split(key, len(cfg.latent_dim) + 4)
    convs = []
    in_dim = cfg.num_features
    for i, out_dim in enumerate(cfg.latent_dim):
        if cfg.relational:
            convs.append(
                rgcn_init(keys[i], in_dim, out_dim, cfg.num_relations,
                          cfg.num_bases)
            )
        else:
            convs.append(gcn_init(keys[i], in_dim, out_dim))
        in_dim = out_dim
    D = cfg.total_latent_dim
    out_dim_head = 1 if cfg.regression else cfg.num_classes
    return {
        "convs": convs,
        "conv1d_1": _conv1d_init(keys[-4], 1, cfg.conv1d_channels[0], D),
        "conv1d_2": _conv1d_init(keys[-3], cfg.conv1d_channels[0],
                                 cfg.conv1d_channels[1], cfg.conv1d_kw2),
        "lin1": linear_init(keys[-2], cfg.dense_dim, 128),
        "lin2": linear_init(keys[-1], 128, out_dim_head),
    }


def dgcnn_forward(params, batch, cfg: DGCNNConfig,
                  key=None, training: bool = False):
    B = batch.num_graphs
    if isinstance(batch, DenseBatch):
        # Dense-blocked trunk + per-slot SortPooling (ops/sort_pool.py
        # dense_sort_pool) — removes the flat segment path's 19-24x TPU
        # penalty for the DGCNN family (round-2 VERDICT item 7).
        if cfg.relational:
            from .rgcn import rgcn_dense_apply

            mask_f = mask_r = batch.edge_mask
            if training and cfg.adj_dropout > 0:
                key, k_edge = jax.random.split(key)
                mask_f, mask_r = edge_dropout_dense(
                    k_edge, batch.edge_mask, cfg.adj_dropout,
                    cfg.force_undirected, training)
            x = jax.nn.one_hot(batch.node_label, cfg.num_features,
                               dtype=jnp.float32)
            x = x * batch.node_mask[..., None].astype(jnp.float32)
            states = []
            for conv_params in params["convs"]:
                x = jnp.tanh(rgcn_dense_apply(
                    conv_params, x, batch.edge_src, batch.edge_dst,
                    batch.edge_type, mask_f, mask_r))
                states.append(x)
            concat_states = jnp.concatenate(states, axis=-1)
        else:
            concat_states, key = _gcn_trunk_dense(params["convs"], batch,
                                                  cfg, key, training)
        pooled = dense_sort_pool(concat_states, batch.node_mask, cfg.k)
    else:
        N = batch.node_label.shape[0]
        emask = batch.edge_mask
        if training and cfg.adj_dropout > 0:
            key, k_edge = jax.random.split(key)
            emask = edge_dropout(k_edge, emask, batch.edge_canon,
                                 cfg.adj_dropout, cfg.force_undirected,
                                 training)

        if cfg.relational:
            x = jax.nn.one_hot(batch.node_label, cfg.num_features,
                               dtype=jnp.float32)
            x = x * batch.node_mask[:, None].astype(jnp.float32)
            states = []
            for conv_params in params["convs"]:
                x = jnp.tanh(
                    rgcn_apply(conv_params, x, batch.edge_src, batch.edge_dst,
                               batch.edge_type, emask, N)
                )
                states.append(x)
            concat_states = jnp.concatenate(states, axis=1)
        else:
            concat_states = _gcn_trunk(params["convs"], batch, emask,
                                       cfg.num_features)

        pooled = global_sort_pool(concat_states, batch.node2graph,
                                  batch.node_mask, B, cfg.k)  # [B, k*D]
    D = cfg.total_latent_dim

    # Conv1d(1, C1, kernel=D, stride=D) == per-slot linear over D channels.
    xk = pooled.reshape(B, cfg.k, D)
    w1 = params["conv1d_1"]["weight"][:, 0, :]           # [C1, D]
    h = jnp.einsum("bkd,od->bok", xk, w1) + params["conv1d_1"]["bias"][None, :, None]
    h = jax.nn.relu(h)                                   # [B, C1, k]
    # MaxPool1d(2, 2)
    k2 = (cfg.k // 2) * 2
    h = h[:, :, :k2].reshape(B, h.shape[1], k2 // 2, 2).max(axis=-1)
    # Conv1d(C1, C2, kernel=5, stride=1)
    h = jax.lax.conv_general_dilated(
        h, params["conv1d_2"]["weight"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv1d_2"]["bias"][None, :, None]
    h = jax.nn.relu(h)
    h = h.reshape(B, -1)

    h = jax.nn.relu(linear_apply(params["lin1"], h))
    if training:
        key, k_drop = jax.random.split(key)
        h = feature_dropout(k_drop, h, 0.5, training)
    out = linear_apply(params["lin2"], h)
    if cfg.regression:
        return out[:, 0]
    return jax.nn.log_softmax(out, axis=-1)
