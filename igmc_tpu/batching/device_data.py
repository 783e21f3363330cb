"""Device-resident datasets: upload the packed subgraphs ONCE, assemble
padded batches ON DEVICE from graph-id vectors.

Host-side collation (batch.py collate) re-uploads every padded batch —
~4-8 MB per superbatch. On TPU the right design keeps the packed
structure-of-arrays (batching/dataset.py _PackedGraphs) resident in HBM and
builds each batch inside jit with ragged-to-padded gathers; the only
per-step host->device traffic is the [B] int32 graph-id vector. Besides
bandwidth, this also removes the per-upload host bookkeeping some remote
backends never release (see memory: axon client leaks uploaded bytes).

The assembled GraphBatch is semantically identical to the host collate
(same node order, same forward/reverse edge pairing for force_undirected
dropout, same targets/masks); the edge LAYOUT differs (all forward edges
first, then all reverse) which is irrelevant to the order-invariant
segment aggregation — igmc_forward outputs match to float tolerance
(tests/test_device_data.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .batch import GraphBatch, topk_sum_bound


def _rel_sorted(packed, R: int):
    """A shallow view of `packed` whose edge tables are stably sorted by
    relation WITHIN each graph (offsets/labels unchanged)."""
    import copy

    gid = np.repeat(np.arange(len(packed), dtype=np.int64),
                    np.diff(packed.edge_offsets))
    order = np.lexsort((packed.etype.astype(np.int64), gid))
    out = copy.copy(packed)
    out.src = packed.src[order]
    out.dst = packed.dst[order]
    out.etype = packed.etype[order]
    return out


def _compact_int(a: np.ndarray) -> np.ndarray:
    """Narrowest of int8/int16/int32 that holds `a` losslessly."""
    if a.size == 0:
        return a.astype(np.int32)
    lo, hi = int(a.min()), int(a.max())
    if -128 <= lo and hi <= 127:
        return a.astype(np.int8)
    if -32768 <= lo and hi <= 32767:
        return a.astype(np.int16)
    return a.astype(np.int32)


class DeviceDataset:
    """The packed subgraph arrays, device-resident, plus static metadata."""

    def __init__(self, packed, node_pad: int, edge_pad: int,
                 batch_graphs: int, sharding=None,
                 rel_sort: Optional[int] = None):
        """`packed` is a batching.dataset._PackedGraphs; `edge_pad` counts
        DIRECTED edges (2x stored forward edges), matching the host ladder.
        `sharding` places the packed tables (e.g. replicated over a DP mesh
        so sharded-batch gathers stay collective-free); default = the
        default device.

        `rel_sort` = R: store each graph's edges SORTED by relation and a
        per-graph [R+1] segment-start table — required by the
        relation-slotted assembly (assemble_dense rel_caps). One host-side
        stable lexsort at build time; flat/unified assemblies still work
        (edge order within a graph is irrelevant to them)."""
        if edge_pad % 2:
            raise ValueError("edge_pad must be even (fwd+rev halves)")
        self.node_pad = int(node_pad)
        self.edge_pad = int(edge_pad)
        self.batch_graphs = int(batch_graphs)
        self.num_graphs = len(packed)
        self.num_relations = rel_sort
        if rel_sort is not None:
            packed = _rel_sorted(packed, int(rel_sort))
            # per-graph relation-segment starts, RELATIVE to the graph's
            # edge offset: [G, R+1] with row = cumsum of per-rel counts
            G, R = len(packed), int(rel_sort)
            gid = np.repeat(np.arange(G, dtype=np.int64),
                            np.diff(packed.edge_offsets))
            cnt = np.zeros((G, R), np.int64)
            np.add.at(cnt, (gid, packed.etype.astype(np.int64)), 1)
            rel_start = np.zeros((G, R + 1), np.int32)
            rel_start[:, 1:] = np.cumsum(cnt, axis=1).astype(np.int32)
            self._rel_start_host = rel_start
        else:
            self._rel_start_host = None

        if sharding is not None:
            def put(x):
                return jax.device_put(x, sharding)
        else:
            put = jax.device_put
        if packed.edge_offsets[-1] >= 2**31 or packed.node_offsets[-1] >= 2**31:
            raise ValueError(
                "packed dataset exceeds int32 addressing "
                f"({int(packed.edge_offsets[-1])} edges); shard it first")
        # Narrowest lossless integer dtype per table: node_label/etype are
        # tiny enums and src/dst are GRAPH-LOCAL indices, so int8/int16
        # usually suffice — at ml_1m full scale this halves the resident
        # tables (24 GB int32 -> ~11 GB), the difference between fitting
        # one chip's HBM or not. assemble_* upcasts to int32 after the
        # gather, so downstream programs are unchanged.
        self.node_label = put(_compact_int(packed.node_label))
        self.src = put(_compact_int(packed.src))
        self.dst = put(_compact_int(packed.dst))  # already +num_u local
        self.etype = put(_compact_int(packed.etype))
        self.node_off = put(packed.node_offsets.astype(np.int32))
        self.edge_off = put(packed.edge_offsets.astype(np.int32))
        self.num_u = put(packed.num_u.astype(np.int32))
        self.y = put(packed.y.astype(np.float32))
        self.u_feat = (put(packed.u_feat) if packed.u_feat is not None
                       else None)
        self.v_feat = (put(packed.v_feat) if packed.v_feat is not None
                       else None)
        self.rel_start = (put(self._rel_start_host)
                          if self._rel_start_host is not None else None)
        # host copies for the loader's shape planning
        self._node_counts = np.diff(packed.node_offsets)
        self._edge_counts = 2 * np.diff(packed.edge_offsets)

    def node_counts(self):
        return self._node_counts

    def edge_counts(self):
        return self._edge_counts

    def __len__(self):
        return self.num_graphs


def _dd_flatten(dd: "DeviceDataset"):
    children = (dd.node_label, dd.src, dd.dst, dd.etype, dd.node_off,
                dd.edge_off, dd.num_u, dd.y, dd.u_feat, dd.v_feat,
                dd.rel_start)
    aux = (dd.node_pad, dd.edge_pad, dd.batch_graphs, dd.num_graphs,
           dd.num_relations)
    return children, aux


def _dd_unflatten(aux, children):
    dd = DeviceDataset.__new__(DeviceDataset)
    (dd.node_label, dd.src, dd.dst, dd.etype, dd.node_off, dd.edge_off,
     dd.num_u, dd.y, dd.u_feat, dd.v_feat, dd.rel_start) = children
    (dd.node_pad, dd.edge_pad, dd.batch_graphs, dd.num_graphs,
     dd.num_relations) = aux
    dd._node_counts = dd._edge_counts = None
    dd._rel_start_host = None
    return dd


jax.tree_util.register_pytree_node(DeviceDataset, _dd_flatten, _dd_unflatten)


def _ragged_slots(counts, starts, pad):
    """Map each padded slot to (batch graph idx, local offset, valid)."""
    cum = jnp.cumsum(counts)                      # [B]
    i = jnp.arange(pad, dtype=jnp.int32)
    b = jnp.searchsorted(cum, i, side="right").astype(jnp.int32)  # [pad]
    valid = b < counts.shape[0]
    b = jnp.minimum(b, counts.shape[0] - 1)
    local = i - starts[b]
    valid = jnp.logical_and(valid, local < counts[b])
    return b, jnp.where(valid, local, 0), valid


def assemble_batch(dd: DeviceDataset, gids) -> GraphBatch:
    """Build one padded GraphBatch on device from graph ids [B] (int32;
    -1 entries = padding graphs). jit-able; shapes are static from `dd`."""
    B = dd.batch_graphs
    node_pad, edge_pad = dd.node_pad, dd.edge_pad
    ef_pad = edge_pad // 2

    gmask = gids >= 0
    g = jnp.where(gmask, gids, 0)

    counts_n = (dd.node_off[g + 1] - dd.node_off[g]) * gmask
    counts_e = (dd.edge_off[g + 1] - dd.edge_off[g]) * gmask  # forward edges
    starts_n = jnp.cumsum(counts_n) - counts_n               # batch-local
    starts_e = jnp.cumsum(counts_e) - counts_e

    # nodes
    nb, nlocal, nvalid = _ragged_slots(counts_n, starts_n, node_pad)
    nsrc = dd.node_off[g[nb]] + nlocal
    node_label = jnp.where(nvalid, dd.node_label[nsrc], 0).astype(jnp.int32)
    node2graph = jnp.where(nvalid, nb, 0).astype(jnp.int32)

    # forward edges
    eb, elocal, evalid = _ragged_slots(counts_e, starts_e, ef_pad)
    epos = dd.edge_off[g[eb]] + elocal
    base = starts_n[eb]
    # tables may be int8/int16-compacted: upcast right after the gather
    f_src = jnp.where(evalid,
                      base + dd.src[epos].astype(jnp.int32),
                      0).astype(jnp.int32)
    f_dst = jnp.where(evalid,
                      base + dd.dst[epos].astype(jnp.int32),
                      0).astype(jnp.int32)
    f_type = jnp.where(evalid, dd.etype[epos].astype(jnp.int32), 0)

    edge_src = jnp.concatenate([f_src, f_dst])
    edge_dst = jnp.concatenate([f_dst, f_src])
    edge_type = jnp.concatenate([f_type, f_type])
    edge_mask = jnp.concatenate([evalid, evalid])
    fwd_ids = jnp.arange(ef_pad, dtype=jnp.int32)
    edge_canon = jnp.concatenate([fwd_ids, fwd_ids])  # rev maps to fwd copy

    target_u = starts_n.astype(jnp.int32)
    target_v = (starts_n + dd.num_u[g]).astype(jnp.int32)
    y = jnp.where(gmask, dd.y[g], 0.0).astype(jnp.float32)

    return GraphBatch(
        node_label=node_label, edge_src=edge_src, edge_dst=edge_dst,
        edge_type=edge_type, edge_canon=edge_canon, node2graph=node2graph,
        node_mask=nvalid, edge_mask=edge_mask, y=y, graph_mask=gmask,
        target_u=target_u, target_v=target_v,
        u_feat=(dd.u_feat[g] * gmask[:, None] if dd.u_feat is not None
                else None),
        v_feat=(dd.v_feat[g] * gmask[:, None] if dd.v_feat is not None
                else None),
    )


def assemble_dense(dd: DeviceDataset, gids, node_slot: int,
                   edge_slot: int,
                   num_u_slot: Optional[int] = None,
                   rel_caps: Optional[tuple] = None) -> "DenseBatch":
    """Build one DenseBatch (batching/dense.py) on device from graph ids
    [B]: each graph lands in a fixed `node_slot`-row block with the target
    user at row 0 and the target item at row 1 (slot_perm semantics,
    computed here with jnp.where instead of a host permutation). Per
    dispatch only the id vector crosses host->device; the row gathers from
    the packed tables happen ONCE per batch (not per layer).

    With `num_u_slot` set, assemble the BIPARTITE layout instead: users in
    rows [0, num_u_slot) (packed order: target user first), items in rows
    [num_u_slot, node_slot) (target item first) — DenseBatch.num_u. The
    packed tables store src user-local and dst = num_u + item-local
    (graphs/extract.py), so the row maps are pure offsets."""
    from .dense import DenseBatch

    B = gids.shape[0]
    n, E = node_slot, edge_slot

    gmask = gids >= 0
    g = jnp.where(gmask, gids, 0)
    nu = dd.num_u[g][:, None]                              # [B, 1]
    counts_n = ((dd.node_off[g + 1] - dd.node_off[g]) * gmask)[:, None]
    counts_e = ((dd.edge_off[g + 1] - dd.edge_off[g]) * gmask)[:, None]

    r = jnp.arange(n, dtype=jnp.int32)[None, :]            # [1, n]
    e = jnp.arange(E, dtype=jnp.int32)[None, :]
    if rel_caps is not None:
        # RELATION-SLOTTED edge axis: slot position e belongs to the
        # static segment pos2rel[e] at local offset pos2local[e]; the
        # packed source index comes from the per-graph relation-start
        # table (requires DeviceDataset(rel_sort=R)).
        if dd.rel_start is None:
            raise ValueError(
                "assemble_dense(rel_caps=...) needs "
                "DeviceDataset(rel_sort=num_relations)")
        if sum(int(c) for c in rel_caps) != E:
            raise ValueError(f"rel_caps {rel_caps} must sum to "
                             f"edge_slot {E}")
        caps = np.asarray(rel_caps, np.int64)
        offs = np.concatenate([[0], np.cumsum(caps)])
        pos2rel = np.repeat(np.arange(len(caps)), caps).astype(np.int32)
        pos2local = (np.arange(E) - offs[pos2rel]).astype(np.int32)
        p2r = jnp.asarray(pos2rel)[None, :]                # [1, E]
        p2l = jnp.asarray(pos2local)[None, :]
        seg_start = dd.rel_start[g][:, p2r[0]]             # [B, E]
        seg_cnt = (dd.rel_start[g][:, p2r[0] + 1] - seg_start)
        evalid = (p2l < seg_cnt) & gmask[:, None]
        epos = (dd.edge_off[g][:, None]
                + jnp.where(evalid, seg_start + p2l, 0))
    else:
        evalid = (e < counts_e) & gmask[:, None]
        epos = dd.edge_off[g][:, None] + jnp.where(evalid, e, 0)
    # tables may be int8/int16-compacted: upcast right after the gather
    src_p = dd.src[epos].astype(jnp.int32)                 # user-local
    dst_p = dd.dst[epos].astype(jnp.int32)                 # num_u + item-local

    if num_u_slot is not None:
        nus = int(num_u_slot)
        # slot row -> packed-local: users keep packed order, items offset
        packed_local = jnp.where(r < nus, r, nu + (r - nus))
        nvalid = jnp.where(r < nus, r < jnp.minimum(counts_n, nu),
                           (r - nus) < (counts_n - nu)) & gmask[:, None]
        edge_src = jnp.where(evalid, src_p, 0)
        edge_dst = jnp.where(evalid, nus + (dst_p - nu), nus)
    else:
        # unified: inverse of dense.slot_perm
        packed_local = jnp.where(
            r == 0, 0, jnp.where(r == 1, nu, jnp.where(r <= nu, r - 1, r)))
        nvalid = (r < counts_n) & gmask[:, None]
        edge_src = jnp.where(evalid, jnp.where(src_p == 0, 0, src_p + 1), 0)
        edge_dst = jnp.where(evalid, jnp.where(dst_p == nu, 1, dst_p), 0)

    nidx = dd.node_off[g][:, None] + jnp.where(nvalid, packed_local, 0)
    node_label = jnp.where(nvalid, dd.node_label[nidx], 0).astype(jnp.int32)
    if rel_caps is not None:
        # relation is determined by the static slot position
        edge_type = jnp.broadcast_to(p2r, (B, E)).astype(jnp.int32)
    else:
        edge_type = jnp.where(evalid, dd.etype[epos].astype(jnp.int32), 0)

    y = jnp.where(gmask, dd.y[g], 0.0).astype(jnp.float32)
    return DenseBatch(
        node_label=node_label,
        edge_src=edge_src.astype(jnp.int32),
        edge_dst=edge_dst.astype(jnp.int32),
        edge_type=edge_type, node_mask=nvalid, edge_mask=evalid,
        y=y, graph_mask=gmask,
        u_feat=(dd.u_feat[g] * gmask[:, None] if dd.u_feat is not None
                else None),
        v_feat=(dd.v_feat[g] * gmask[:, None] if dd.v_feat is not None
                else None),
        num_u=(int(num_u_slot) if num_u_slot is not None else None),
        rel_caps=(tuple(int(c) for c in rel_caps)
                  if rel_caps is not None else None),
    )


def capacity_bound(node_counts, edge_counts, batch_size: int):
    """Static pads valid for EVERY possible batch of `batch_size` graphs
    (topk_sum_bound rounded up to 8 / 16). Safe under any epoch shuffle."""
    max_n, max_e = topk_sum_bound(node_counts, edge_counts, batch_size)
    rnd = lambda v, m: int(-(-max(v, m) // m) * m)
    return rnd(max_n, 8), rnd(max_e, 16)


def plan_gid_epoch(dd: DeviceDataset, order: np.ndarray, superbatch: int):
    """Split a permutation of graph ids into [K, B] superbatch id blocks,
    padding short batches with -1. Trailing blocks that don't fill a whole
    [K, B] group are stacked and PADDED with all-(-1) rows to the same
    [K, B] shape, so each (B, K) compiles exactly ONE program — on a
    backend with a slow compile service (tunneled TPU) a second compiled
    shape costs minutes, vs microseconds for the dead scan iterations (the
    train step selects the pre-update state back for all-(-1) rows; the
    eval/loss masks already zero them).
    Returns (supers, rest) where rest is always [] (kept for callers that
    append `rest` blocks as [1, B] units)."""
    B = dd.batch_graphs
    n = len(order)
    blocks = []
    for s in range(0, n, B):
        blk = order[s : s + B].astype(np.int32)
        if len(blk) < B:
            blk = np.concatenate([blk, np.full(B - len(blk), -1, np.int32)])
        blocks.append(blk)
    K = superbatch if superbatch > 1 else 1
    n_super = len(blocks) // K
    supers = [np.stack(blocks[i * K : (i + 1) * K]) for i in range(n_super)]
    rem = blocks[n_super * K :]
    if rem:
        rem = rem + [np.full(B, -1, np.int32)] * (K - len(rem))
        supers.append(np.stack(rem))
    return supers, []


def live_rows(gid_block: np.ndarray) -> int:
    """Rows of a [K, B] gid block holding at least one real graph id.
    Epoch loops advance their step counter by THIS (not K), so the
    per-step RNG fold-in indices are unchanged by the all-(-1) padding
    rows plan_gid_epoch/plan_dense_epoch append."""
    return int((np.asarray(gid_block) >= 0).any(axis=1).sum())
