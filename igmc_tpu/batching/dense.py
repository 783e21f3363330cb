"""Dense-blocked batching: one fixed node SLOT per graph, targets at rows 0/1.

The flat layout (batch.py) concatenates graphs into one disjoint edge list
and aggregates with segment ops — the direct translation of PyG's Batch.
On TPU, per-edge gathers and segment scatters are row-serial and dominate
the whole model (measured: ~0.6 ms/layer at 64k edges on v5e, >90% of the
step). IGMC's enclosing subgraphs are tiny (p50 ~35-100 nodes on the Monti
datasets), so the TPU-native layout is DENSE-BLOCKED instead:

  * every graph occupies a fixed slot of `n` node rows -> x is [B, n, C];
  * the target user sits at row 0 and the target item at row 1, so the
    readout (/root/reference/models.py:205-207) is a pure slice — no gather;
  * edges are stored ONCE in the forward (user->item) direction as [B, E]
    graph-local indices; the reverse direction is applied inside the layer
    as a transposed contraction, halving host->device bytes;
  * aggregation becomes batched one-hot matmuls (models/rgcn.py
    rgcn_dense_apply): gather = src_onehot @ x, scatter = dst_onehotT @ msg
    — 100% MXU, no serial addressing, forward and backward.

Cost model: dense does O(B * E * n) extra MAC work vs the flat layout's
O(E) addressing — on the MXU that trade wins by >30x (bench.py r5_dense).
Power-law graph sizes are handled by SIZE BUCKETING (plan_dense_buckets):
graphs are grouped into a few (n, E) slot shapes so one outlier does not
inflate every slot. Mean/sum aggregation is node-order and batch-composition
invariant, so bucketed batches change only SGD batch composition (the same
effect as any shuffle), not the model math.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graphs.extract import Subgraph


@dataclass
class DenseBatch:
    """B graphs in fixed node slots.

    Two slot layouts share this container, distinguished by `num_u`:

    * UNIFIED (`num_u is None`): one n-row slot per graph, target user at
      row 0 and target item at row 1 (slot_perm); user/item rows interleave
      at a per-graph boundary. One-hot aggregation matmuls span all n rows.
    * BIPARTITE (`num_u = nu`, a STATIC per-bucket boundary): users occupy
      rows [0, nu) and items rows [nu, n), target user at row 0 and target
      item at row nu. Because IGMC subgraphs are bipartite (every forward
      edge is user->item, graphs/extract.py), each one-hot gather/scatter
      spans only ITS side — width nu or n-nu instead of n — halving the
      MAC and VPU (one-hot materialization) work of the dense R-GCN trunk
      (models/rgcn.py rgcn_dense_bipartite_apply) with identical math.
    """

    node_label: np.ndarray   # int32 [B, n]  hop/side label per node row
    edge_src: np.ndarray     # int32 [B, E]  forward-edge user row (graph-local)
    edge_dst: np.ndarray     # int32 [B, E]  forward-edge item row (graph-local)
    edge_type: np.ndarray    # int32 [B, E]  rating label per forward edge
    node_mask: np.ndarray    # bool  [B, n]
    edge_mask: np.ndarray    # bool  [B, E]
    y: np.ndarray            # float32 [B] regression target
    graph_mask: np.ndarray   # bool  [B]
    u_feat: Optional[np.ndarray] = None  # float32 [B, du]
    v_feat: Optional[np.ndarray] = None  # float32 [B, dv]
    # Pytree AUX: leading-axis interpretation, as in GraphBatch.stacked.
    stacked: Optional[str] = None
    # Pytree AUX: static user/item slot boundary (bipartite layout) or None.
    num_u: Optional[int] = None
    # Pytree AUX: RELATION-SLOTTED edge axis (or None): tuple of R static
    # per-relation capacities summing to edge_slot. Each graph's
    # relation-r edges occupy [off_r, off_r + count_r) where
    # off_r = sum(caps[:r]) — so the layer reads the relation from the
    # POSITION and needs no rel one-hot and no per-edge [E, nb*C] outer
    # product (models/rgcn.py rgcn_dense_relslot_apply).
    rel_caps: Optional[tuple] = None

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def node_slot(self) -> int:
        return self.node_label.shape[-1]

    @property
    def edge_slot(self) -> int:
        return self.edge_src.shape[-1]

    def shape_key(self) -> Tuple[int, int, int]:
        return (self.num_graphs, self.node_slot, self.edge_slot)


def _register_pytree():
    import jax

    fields = [
        "node_label", "edge_src", "edge_dst", "edge_type",
        "node_mask", "edge_mask", "y", "graph_mask", "u_feat", "v_feat",
    ]
    jax.tree_util.register_pytree_node(
        DenseBatch,
        lambda b: ([getattr(b, f) for f in fields],
                   (b.stacked, b.num_u, b.rel_caps)),
        lambda aux, xs: DenseBatch(*xs, stacked=aux[0], num_u=aux[1],
                                   rel_caps=aux[2]),
    )


_register_pytree()


def slot_perm(num_u: int, num_nodes: int) -> np.ndarray:
    """Extraction-order -> slot-row permutation.

    Extraction order is [target_user, users..., target_item, items...]
    (graphs/extract.py Subgraph): target user at 0, target item at num_u.
    Slot order moves the target item to row 1 so both targets are fixed
    slices: 0 -> 0, num_u -> 1, other users j -> j+1, other items d -> d.
    The image is exactly {0..num_nodes-1} (rows stay contiguous).
    """
    perm = np.empty(num_nodes, dtype=np.int32)
    perm[0] = 0
    perm[1:num_u] = np.arange(1, num_u, dtype=np.int32) + 1
    perm[num_u] = 1
    if num_nodes > num_u + 1:
        perm[num_u + 1:] = np.arange(num_u + 1, num_nodes, dtype=np.int32)
    return perm


def collate_dense(
    graphs: Sequence[Subgraph],
    num_graphs: int,
    node_slot: int,
    edge_slot: int,
    num_u_slot: Optional[int] = None,
    rel_caps: Optional[tuple] = None,
) -> DenseBatch:
    """Pack subgraphs one-per-slot. Slots must fit the largest graph.

    With `num_u_slot` set, pack the BIPARTITE layout: user nodes keep
    their extraction order in rows [0, num_u_slot) (target user already
    first, graphs/extract.py) and item nodes theirs in rows
    [num_u_slot, node_slot) (target item first) — no permutation at all,
    each side just offset. Requires num_u <= num_u_slot and
    num_v <= node_slot - num_u_slot for every graph.

    With `rel_caps` (tuple of R per-relation capacities summing to
    edge_slot), pack the RELATION-SLOTTED edge axis: each graph's
    relation-r edges land at [sum(caps[:r]), sum(caps[:r]) + count_r).
    Composes with the bipartite node layout.
    """
    B, n, E = num_graphs, node_slot, edge_slot
    n_real = len(graphs)
    assert n_real <= B
    if rel_caps is not None:
        rel_caps = tuple(int(c) for c in rel_caps)
        if sum(rel_caps) != E:
            raise ValueError(f"rel_caps {rel_caps} must sum to edge_slot {E}")
        rel_off = np.concatenate([[0], np.cumsum(rel_caps)[:-1]]).astype(
            np.int64)

    node_label = np.zeros((B, n), dtype=np.int32)
    node_mask = np.zeros((B, n), dtype=bool)
    edge_src = np.zeros((B, E), dtype=np.int32)
    edge_dst = np.zeros((B, E), dtype=np.int32)
    edge_type = np.zeros((B, E), dtype=np.int32)
    edge_mask = np.zeros((B, E), dtype=bool)
    y = np.zeros(B, dtype=np.float32)
    graph_mask = np.zeros(B, dtype=bool)

    has_side = graphs and graphs[0].u_feat is not None
    u_feat = v_feat = None
    if has_side:
        u_feat = np.zeros((B, graphs[0].u_feat.shape[0]), dtype=np.float32)
        v_feat = np.zeros((B, graphs[0].v_feat.shape[0]), dtype=np.float32)

    for gi, g in enumerate(graphs):
        nn, ne = g.num_nodes, len(g.src)
        if ne > E:
            raise ValueError(
                f"graph ({nn} nodes, {ne} fwd edges) exceeds dense slot "
                f"({n}, {E})")
        if num_u_slot is None:
            if nn > n:
                raise ValueError(
                    f"graph ({nn} nodes, {ne} fwd edges) exceeds dense slot "
                    f"({n}, {E})")
            perm = slot_perm(g.num_u, nn)
            node_mask[gi, :nn] = True
        else:
            if g.num_u > num_u_slot or g.num_v > n - num_u_slot:
                raise ValueError(
                    f"graph ({g.num_u} users, {g.num_v} items) exceeds "
                    f"bipartite slot ({num_u_slot}, {n - num_u_slot})")
            # users: extraction rows [0, num_u) stay; items shift to
            # [num_u_slot, num_u_slot + num_v)
            perm = np.concatenate([
                np.arange(g.num_u, dtype=np.int32),
                num_u_slot + np.arange(g.num_v, dtype=np.int32)])
            node_mask[gi, :g.num_u] = True
            node_mask[gi, num_u_slot:num_u_slot + g.num_v] = True
        node_label[gi, perm] = g.node_label
        if rel_caps is None:
            epos = np.arange(ne)
        else:
            # place relation-r edges in their static segment
            epos = np.empty(ne, dtype=np.int64)
            for r_ in np.unique(g.etype):
                sel = np.flatnonzero(g.etype == r_)
                if len(sel) > rel_caps[r_]:
                    raise ValueError(
                        f"graph has {len(sel)} relation-{r_} edges > "
                        f"capacity {rel_caps[r_]}")
                epos[sel] = rel_off[r_] + np.arange(len(sel))
        edge_src[gi, epos] = perm[g.src]
        edge_dst[gi, epos] = perm[g.dst]
        edge_type[gi, epos] = g.etype
        edge_mask[gi, epos] = True
        y[gi] = g.y
        graph_mask[gi] = True
        if has_side:
            u_feat[gi] = g.u_feat
            v_feat[gi] = g.v_feat

    if num_u_slot is not None:
        # padded edges must index a VALID item row so one_hot(dst - nu)
        # stays in range (they are mask-zeroed regardless)
        edge_dst[~edge_mask] = num_u_slot
    if rel_caps is not None:
        # padded positions carry their segment's relation id
        for r_, (off, cap) in enumerate(zip(rel_off, rel_caps)):
            seg = slice(int(off), int(off) + cap)
            edge_type[:, seg][~edge_mask[:, seg]] = r_

    return DenseBatch(
        node_label=node_label, edge_src=edge_src, edge_dst=edge_dst,
        edge_type=edge_type, node_mask=node_mask, edge_mask=edge_mask,
        y=y, graph_mask=graph_mask, u_feat=u_feat, v_feat=v_feat,
        num_u=num_u_slot, rel_caps=rel_caps,
    )


def _round8(v: int) -> int:
    return int(-(-max(int(v), 8) // 8) * 8)


@dataclass(frozen=True)
class DenseBucket:
    """One compiled slot shape plus the dataset indices assigned to it.

    `num_u_slot` is None for the unified layout; for bipartite buckets it
    is the static user/item row boundary (node_slot = user rows + item
    rows, each side rounded to 8 independently)."""

    node_slot: int
    edge_slot: int
    indices: np.ndarray  # int64 dataset indices whose graphs fit this slot
    num_u_slot: Optional[int] = None


def _plan_buckets_core(dims, width_of, make_bucket, max_buckets: int,
                       grid: int) -> List[DenseBucket]:
    """Shared contiguous-segment DP behind the bucket planners.

    `dims` = list of per-graph dimension arrays (the LAST is the edge
    count; the rest are node-side widths). Graphs are sorted by real
    width(dims)*edges cost; the DP over `grid` candidate cut points picks
    <= max_buckets contiguous segments minimizing
    sum(count * width(maxima) * round8(edge max)); `make_bucket(maxima,
    indices)` builds each bucket from the rounded member maxima, and
    shape-identical adjacent buckets merge.
    """
    dims = [np.asarray(d, dtype=np.int64) for d in dims]
    n = len(dims[0])
    if n == 0:
        return []
    ec = dims[-1]
    cost = sum(dims[:-1]) * np.maximum(ec, 1)
    order = np.argsort(cost, kind="stable")
    sorted_dims = [d[order] for d in dims]
    cuts = np.unique(np.linspace(0, n, min(grid, n) + 1).astype(np.int64))
    C = len(cuts)
    # per-[cuts[i], cuts[j]) window maxima, by running max over segment maxima
    seg_max = [np.array([d[cuts[i]:cuts[i + 1]].max(initial=0)
                         for i in range(C - 1)]) for d in sorted_dims]

    INF = float("inf")
    k = max(1, int(max_buckets))
    dp = np.full((C, k + 1), INF)
    dp[0, 0] = 0.0
    parent = np.zeros((C, k + 1), np.int64)
    for i in range(C - 1):
        run = [0] * len(dims)
        for j in range(i + 1, C):
            for d in range(len(dims)):
                run[d] = max(run[d], int(seg_max[d][j - 1]))
            w = ((cuts[j] - cuts[i]) * width_of(run[:-1])
                 * _round8(run[-1]))
            for b in range(1, k + 1):
                v = dp[i, b - 1] + w
                if v < dp[j, b]:
                    dp[j, b] = v
                    parent[j, b] = i

    best_b = int(np.argmin(dp[C - 1, 1:]) + 1)
    segs = []
    j, b = C - 1, best_b
    while b > 0 and j > 0:
        i = parent[j, b]
        segs.append((int(cuts[i]), int(cuts[j])))
        j, b = int(i), b - 1
    segs.reverse()

    buckets: List[DenseBucket] = []
    for i, j in segs:
        idx = order[i:j]
        maxima = [_round8(d[i:j].max()) for d in sorted_dims]
        nb = make_bucket(maxima, idx)
        if buckets and (nb.node_slot, nb.edge_slot, nb.num_u_slot) == (
                buckets[-1].node_slot, buckets[-1].edge_slot,
                buckets[-1].num_u_slot):
            buckets[-1] = DenseBucket(
                nb.node_slot, nb.edge_slot,
                np.concatenate([buckets[-1].indices, nb.indices]),
                nb.num_u_slot)
        else:
            buckets.append(nb)
    return buckets


def plan_dense_buckets(
    node_counts,
    fwd_edge_counts,
    max_buckets: int = 3,
    grid: int = 256,
) -> List[DenseBucket]:
    """Partition graphs into <= max_buckets (node, edge) slot shapes,
    minimizing total padded COMPUTE, not graph-count quantiles.

    The dense R-GCN aggregate's per-graph cost is ~ node_slot x edge_slot
    (one-hot [e, n] matmuls; measured on the v5e across the flixster /
    yahoo / r5 bench shapes, all within ~2x of a single constant), so
    graphs are sorted by their real n*e cost and the shared DP
    (_plan_buckets_core) picks the <= max_buckets contiguous segments
    minimizing sum(count * node_slot * edge_slot) — each bucket's slots
    are the member maxima rounded up to multiples of 8 for TPU tiling.
    On douban this cuts padded compute 1.5x vs node-quantile splitting
    at the same bucket (= compiled-program) count, and the knob
    composes: more buckets keep shrinking padding at ~2 compiled
    programs each (see --dense-buckets).
    """
    return _plan_buckets_core(
        [node_counts, fwd_edge_counts],
        width_of=lambda nodes: _round8(nodes[0]),
        make_bucket=lambda m, idx: DenseBucket(m[0], m[1], idx),
        max_buckets=max_buckets, grid=grid)


def plan_rel_caps(etypes: Sequence[np.ndarray], num_relations: int,
                  base: int = 8) -> tuple:
    """Static per-relation edge capacities covering every graph: for each
    relation r, the max count over graphs, rounded up to `base` (so each
    segment is tile-aligned). Sum = the relation-slotted edge_slot."""
    caps = np.zeros(num_relations, dtype=np.int64)
    for et in etypes:
        if len(et):
            cnt = np.bincount(et, minlength=num_relations)
            caps = np.maximum(caps, cnt)
    return tuple(int(-(-max(int(c), base) // base) * base) for c in caps)


def plan_bipartite_buckets(
    u_counts,
    v_counts,
    fwd_edge_counts,
    max_buckets: int = 3,
    grid: int = 256,
) -> List[DenseBucket]:
    """plan_dense_buckets for the BIPARTITE slot layout: each bucket gets
    separate user/item slot widths (member maxima, each rounded to 8) and
    the compute cost of a member is (nu_slot + nv_slot) * edge_slot — the
    one-hot matmuls span one side each. Same shared DP; sort key is real
    (nu + nv) * e cost."""
    return _plan_buckets_core(
        [u_counts, v_counts, fwd_edge_counts],
        width_of=lambda sides: _round8(sides[0]) + _round8(sides[1]),
        make_bucket=lambda m, idx: DenseBucket(m[0] + m[1], m[2], idx,
                                               m[0]),
        max_buckets=max_buckets, grid=grid)
