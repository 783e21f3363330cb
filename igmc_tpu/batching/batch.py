"""Fixed-shape batching: variable-size subgraphs -> static padded arrays.

This is the TPU replacement for PyG's dynamic Batch collation
(/root/reference/train_eval.py:44-51): XLA compiles one program per
(node_pad, edge_pad) bucket, so batches are padded up a small geometric
ladder of sizes and every op downstream is masked.

Layout invariants:
  * graphs are concatenated; node/edge indices are offset per graph.
  * per graph, edges are stored [forward..., reverse...] — forward edges are
    user->item (src < dst within the graph). `edge_canon` maps every edge to
    the batch index of its forward copy so force_undirected edge dropout can
    draw one Bernoulli per undirected pair and broadcast it
    (reference semantics: PyG dropout_adj(force_undirected=True)).
  * padded edges point at node 0 with edge_mask 0; padded nodes/graphs are
    masked via node_mask/graph_mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graphs.extract import Subgraph


@dataclass
class GraphBatch:
    """A static-shape batch of B disjoint subgraphs (NumPy or JAX arrays)."""

    node_label: np.ndarray   # int32 [N]   hop/side label per node
    edge_src: np.ndarray     # int32 [E]   source node (batch-local)
    edge_dst: np.ndarray     # int32 [E]   destination node (batch-local)
    edge_type: np.ndarray    # int32 [E]   rating label per edge
    edge_canon: np.ndarray   # int32 [E]   index of this edge's forward copy
    node2graph: np.ndarray   # int32 [N]   graph id per node
    node_mask: np.ndarray    # bool  [N]
    edge_mask: np.ndarray    # bool  [E]
    y: np.ndarray            # float32 [B] regression target
    graph_mask: np.ndarray   # bool  [B]
    target_u: np.ndarray     # int32 [B]   batch-local node idx of target user
    target_v: np.ndarray     # int32 [B]   batch-local node idx of target item
    u_feat: Optional[np.ndarray] = None  # float32 [B, du]
    v_feat: Optional[np.ndarray] = None  # float32 [B, dv]
    # Optional dst/src-blocked aggregation plans (ops/blocked.py) for the
    # scatter-free flat R-GCN path — attached by BatchLoader when
    # flat_aggregate is 'blocked'; None rides through pytree ops untouched.
    blocked: Optional[object] = None
    # Optional Pallas block-aligned edges (kernels/rgcn_aggregate.py
    # block_align_edges output tuple) — attached by BatchLoader when
    # flat_aggregate is 'pallas'.
    aligned: Optional[tuple] = None
    # Optional TRANSPOSED (src-sorted) alignment for the Pallas TRAINING
    # path: the backward dx is the same indicator-matmul kernel with
    # src/dst roles swapped (kernels/rgcn_aggregate.py bwd kernel).
    aligned_t: Optional[tuple] = None
    # Pytree AUX (static, not a leaf): how a leading stack axis should be
    # interpreted — None (flat), "superbatch" (scan over K training steps),
    # or "devices" (one sub-batch per mesh device). Consumers must not
    # infer this from y.ndim (ADVICE round 1: the two stacks are ambiguous).
    stacked: Optional[str] = None

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.node_label.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]

    def shape_key(self) -> Tuple[int, int, int]:
        return (self.num_graphs, self.num_nodes, self.num_edges)


def _register_pytree():
    import jax

    fields = [
        "node_label", "edge_src", "edge_dst", "edge_type", "edge_canon",
        "node2graph", "node_mask", "edge_mask", "y", "graph_mask",
        "target_u", "target_v", "u_feat", "v_feat", "blocked", "aligned",
        "aligned_t",
    ]
    jax.tree_util.register_pytree_node(
        GraphBatch,
        lambda b: ([getattr(b, f) for f in fields], b.stacked),
        lambda aux, xs: GraphBatch(*xs, stacked=aux),
    )


_register_pytree()


def topk_sum_bound(node_counts, edge_counts, batch_size: int):
    """Worst-case node/edge totals over ANY batch of `batch_size` graphs:
    the sum of the `batch_size` largest per-graph counts. Shared by the host
    bucket-ladder estimate and the device-resident capacity pads so the two
    paths can never disagree on what 'fits'."""
    k = min(batch_size, len(node_counts))
    max_n = int(np.sort(node_counts)[-k:].sum())
    max_e = int(np.sort(edge_counts)[-k:].sum())
    return max_n, max_e


def pad_ladder(max_val: int, base: int = 64, ratio: float = 1.5) -> List[int]:
    """Geometric ladder of pad sizes covering [base, >= max_val].

    ratio 1.5 bounds padding waste at ~33% while keeping the number of
    compiled programs small (~log1.5 of the range).
    """
    sizes = [base]
    while sizes[-1] < max_val:
        sizes.append(int(np.ceil(sizes[-1] * ratio / 8.0)) * 8)
    return sizes


def bucket_for(n: int, ladder: Sequence[int]) -> int:
    """Smallest ladder size >= n (ladder is ascending)."""
    for s in ladder:
        if s >= n:
            return s
    return ladder[-1] if ladder and ladder[-1] >= n else int(np.ceil(n / 8.0)) * 8


def collate(
    graphs: Sequence[Subgraph],
    num_graphs: int,
    node_pad: int,
    edge_pad: int,
) -> GraphBatch:
    """Merge subgraphs into one padded disjoint batch-graph.

    `num_graphs`/`node_pad`/`edge_pad` must be >= the actual totals; the
    remainder is masked padding.
    """
    B = num_graphs
    n_real = len(graphs)
    assert n_real <= B

    total_nodes = sum(g.num_nodes for g in graphs)
    total_edges = sum(g.num_edges for g in graphs)  # doubled (fwd+rev)
    if total_nodes > node_pad or total_edges > edge_pad:
        raise ValueError(
            f"batch needs ({total_nodes} nodes, {total_edges} edges) "
            f"> pad ({node_pad}, {edge_pad})"
        )

    node_label = np.zeros(node_pad, dtype=np.int32)
    node2graph = np.zeros(node_pad, dtype=np.int32)
    node_mask = np.zeros(node_pad, dtype=bool)
    edge_src = np.zeros(edge_pad, dtype=np.int32)
    edge_dst = np.zeros(edge_pad, dtype=np.int32)
    edge_type = np.zeros(edge_pad, dtype=np.int32)
    edge_canon = np.arange(edge_pad, dtype=np.int32)
    edge_mask = np.zeros(edge_pad, dtype=bool)
    y = np.zeros(B, dtype=np.float32)
    graph_mask = np.zeros(B, dtype=bool)
    target_u = np.zeros(B, dtype=np.int32)
    target_v = np.zeros(B, dtype=np.int32)

    has_side = graphs and graphs[0].u_feat is not None
    u_feat = v_feat = None
    if has_side:
        du = graphs[0].u_feat.shape[0]
        dv = graphs[0].v_feat.shape[0]
        u_feat = np.zeros((B, du), dtype=np.float32)
        v_feat = np.zeros((B, dv), dtype=np.float32)

    n_off = 0
    e_off = 0
    for gi, g in enumerate(graphs):
        n = g.num_nodes
        ne = len(g.src)  # forward edges
        node_label[n_off : n_off + n] = g.node_label
        node2graph[n_off : n_off + n] = gi
        node_mask[n_off : n_off + n] = True
        # forward block
        edge_src[e_off : e_off + ne] = g.src + n_off
        edge_dst[e_off : e_off + ne] = g.dst + n_off
        edge_type[e_off : e_off + ne] = g.etype
        # reverse block
        edge_src[e_off + ne : e_off + 2 * ne] = g.dst + n_off
        edge_dst[e_off + ne : e_off + 2 * ne] = g.src + n_off
        edge_type[e_off + ne : e_off + 2 * ne] = g.etype
        edge_canon[e_off + ne : e_off + 2 * ne] = np.arange(
            e_off, e_off + ne, dtype=np.int32
        )
        edge_mask[e_off : e_off + 2 * ne] = True
        y[gi] = g.y
        graph_mask[gi] = True
        target_u[gi] = n_off            # target user is first user node
        target_v[gi] = n_off + g.num_u  # target item is first item node
        if has_side:
            u_feat[gi] = g.u_feat
            v_feat[gi] = g.v_feat
        n_off += n
        e_off += 2 * ne

    return GraphBatch(
        node_label=node_label,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_type=edge_type,
        edge_canon=edge_canon,
        node2graph=node2graph,
        node_mask=node_mask,
        edge_mask=edge_mask,
        y=y,
        graph_mask=graph_mask,
        target_u=target_u,
        target_v=target_v,
        u_feat=u_feat,
        v_feat=v_feat,
    )
