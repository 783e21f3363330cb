"""Subgraph datasets (static precomputed + dynamic on-the-fly) and the batch loader.

Replaces the reference's PyG InMemoryDataset / Dataset pair
(/root/reference/util_functions.py:69-145):

  * StaticGraphDataset — extracts all subgraphs once, stores them in a packed
    structure-of-arrays (concatenated fields + offsets, compact and O(1) to
    slice), and caches to `<root>/processed/data.npz` (data_<max_num>.npz when
    subsampled), mirroring the reference cache layout semantics.
  * DynamicGraphDataset — extracts at access time (memory-light path for
    ml_1m-scale data).
  * BatchLoader — shuffles per epoch (seeded), collates fixed-size padded
    batches on a geometric bucket ladder, and prefetches to device on a
    thread pool (replaces DataLoader workers + per-batch H2D copies).

`max_num` subsampling uses np.random.seed(123) permutation exactly like the
reference (/root/reference/util_functions.py:84-90).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..graphs.csr import BipartiteCSR
from ..graphs.extract import Subgraph, extract_many
from .batch import GraphBatch, collate, pad_ladder, bucket_for, topk_sum_bound


def _adjacency_digest(A, labels, class_values) -> str:
    """Short content digest of everything that shapes extracted subgraphs
    beyond the structural cache key: the adjacency VALUES (rating_map /
    post_rating_map / --standard-rating rewrite them in place, changing
    edge types without changing n/h/mnph), the link labels, and the
    class-value table (targets). Guards against serving a stale .npz after
    a rating-map flag toggle on the same data root."""
    import hashlib

    h = hashlib.sha1()
    if isinstance(A, BipartiteCSR):
        parts = (A.u_indptr, A.u_indices, A.u_data)
    else:
        Ac = A.tocsr() if hasattr(A, "tocsr") else A
        parts = (Ac.indptr, Ac.indices, Ac.data)
    for p in parts:
        h.update(np.ascontiguousarray(p).tobytes())
    h.update(np.ascontiguousarray(np.asarray(labels)).tobytes())
    if class_values is not None:
        h.update(np.ascontiguousarray(np.asarray(class_values)).tobytes())
    return h.hexdigest()[:10]


# Compress .npz caches only up to this many raw bytes (zlib ~3 MB/s makes
# bigger writes cost more wall-clock than the disk it saves).
NPZ_COMPRESS_MAX_BYTES = 4 << 30


def _apply_max_num(links, labels, max_num):
    if max_num is None:
        return links, labels
    np.random.seed(123)
    perm = np.random.permutation(len(links[0]))[:max_num]
    return (links[0][perm], links[1][perm]), labels[perm]


class _PackedGraphs:
    """Structure-of-arrays storage for a list of Subgraphs."""

    def __init__(self, graphs: Sequence[Subgraph]):
        n = len(graphs)
        self.node_offsets = np.zeros(n + 1, dtype=np.int64)
        self.edge_offsets = np.zeros(n + 1, dtype=np.int64)
        for i, g in enumerate(graphs):
            self.node_offsets[i + 1] = self.node_offsets[i] + g.num_nodes
            self.edge_offsets[i + 1] = self.edge_offsets[i] + len(g.src)
        self.node_label = (
            np.concatenate([g.node_label for g in graphs])
            if n else np.zeros(0, np.int32)
        )
        self.src = np.concatenate([g.src for g in graphs]) if n else np.zeros(0, np.int32)
        self.dst = np.concatenate([g.dst for g in graphs]) if n else np.zeros(0, np.int32)
        self.etype = np.concatenate([g.etype for g in graphs]) if n else np.zeros(0, np.int32)
        self.num_u = np.array([g.num_u for g in graphs], dtype=np.int32)
        self.y = np.array([g.y for g in graphs], dtype=np.float32)
        if n and graphs[0].u_feat is not None:
            self.u_feat = np.stack([g.u_feat for g in graphs]).astype(np.float32)
            self.v_feat = np.stack([g.v_feat for g in graphs]).astype(np.float32)
        else:
            self.u_feat = None
            self.v_feat = None

    @classmethod
    def _from_arrays(cls, d):
        obj = cls.__new__(cls)
        obj.node_offsets = d["node_offsets"]
        obj.edge_offsets = d["edge_offsets"]
        obj.node_label = d["node_label"]
        obj.src = d["src"]
        obj.dst = d["dst"]
        obj.etype = d["etype"]
        obj.num_u = d["num_u"]
        obj.y = d["y"]
        obj.u_feat = d.get("u_feat")
        obj.v_feat = d.get("v_feat")
        return obj

    def __len__(self):
        return len(self.y)

    def get(self, i: int) -> Subgraph:
        ns, ne = self.node_offsets[i], self.node_offsets[i + 1]
        es, ee = self.edge_offsets[i], self.edge_offsets[i + 1]
        return Subgraph(
            src=self.src[es:ee],
            dst=self.dst[es:ee],
            etype=self.etype[es:ee],
            node_label=self.node_label[ns:ne],
            num_u=int(self.num_u[i]),
            num_v=int(ne - ns - self.num_u[i]),
            y=float(self.y[i]),
            u_feat=self.u_feat[i] if self.u_feat is not None else None,
            v_feat=self.v_feat[i] if self.v_feat is not None else None,
        )

    def node_counts(self) -> np.ndarray:
        return np.diff(self.node_offsets)

    def edge_counts(self) -> np.ndarray:
        """Directed (doubled) edge counts."""
        return 2 * np.diff(self.edge_offsets)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        d = dict(
            node_offsets=self.node_offsets, edge_offsets=self.edge_offsets,
            node_label=self.node_label, src=self.src, dst=self.dst,
            etype=self.etype, num_u=self.num_u, y=self.y,
        )
        if self.u_feat is not None:
            d["u_feat"] = self.u_feat
            d["v_feat"] = self.v_feat
        # zlib at ~3 MB/s turns a full-scale ml_1m cache write (22 GB of
        # packed arrays) into tens of minutes; past a few GB, disk is
        # cheaper than the user's time.
        raw_bytes = sum(a.nbytes for a in d.values())
        if raw_bytes > NPZ_COMPRESS_MAX_BYTES:
            np.savez(path, **d)
        else:
            np.savez_compressed(path, **d)

    @classmethod
    def load(cls, path: str) -> "_PackedGraphs":
        with np.load(path, allow_pickle=False) as z:
            return cls._from_arrays({k: z[k] for k in z.files})


class StaticGraphDataset:
    """Precomputed, disk-cached enclosing-subgraph dataset."""

    def __init__(
        self,
        root: str,
        A,
        links,
        labels,
        h: int = 1,
        sample_ratio: float = 1.0,
        max_nodes_per_hop: Optional[int] = None,
        u_features=None,
        v_features=None,
        class_values=None,
        max_num: Optional[int] = None,
        seed: int = 0,
        backend: str = "auto",
        progress: bool = True,
    ):
        self.root = root
        links, labels = _apply_max_num(links, labels, max_num)
        # The cache key covers every input that changes the extracted
        # subgraphs (the reference's fixed data.pt silently served stale
        # caches when --hop/--max-nodes-per-hop/--debug changed between
        # runs; /root/reference/util_functions.py:95-99). When subsampling
        # is active the numpy and native engines draw different RNG
        # streams, so the effective backend joins the key too.
        key = (f"h{h}_sr{sample_ratio:g}_mnph{max_nodes_per_hop}"
               f"_f{int(u_features is not None)}_n{len(links[0])}"
               f"_d{_adjacency_digest(A, labels, class_values)}")
        # A per-hop cap at least as large as the bigger bipartite side can
        # never bind (a fringe is a subset of one side's nodes), so e.g.
        # the CLI default mnph=10000 on 3000x3000 Monti graphs is a no-op.
        side = max(A.shape) if hasattr(A, "shape") else max(
            A.num_users, A.num_items)
        mnph_binds = (max_nodes_per_hop is not None
                      and max_nodes_per_hop < side)
        if sample_ratio < 1.0 or mnph_binds:
            # Only subsampling consumes RNG, so the stream seed and the
            # engine (numpy/native draw different streams) join the key
            # only then — otherwise every model seed would needlessly
            # re-extract an identical dataset.
            from ..graphs import native as _native

            eff = ("native" if backend in ("auto", "native")
                   and _native.available() else "numpy")
            key += f"_s{seed}_b{eff}"
        name = (f"data_{key}.npz" if max_num is None
                else f"data_{key}_m{max_num}.npz")
        cache = os.path.join(root, "processed", name) if root else None
        if cache and os.path.isfile(cache):
            self.packed = _PackedGraphs.load(cache)
        else:
            if not isinstance(A, BipartiteCSR):
                A = BipartiteCSR(A)
            graphs = extract_many(
                links, labels, A, h, sample_ratio, max_nodes_per_hop,
                _densify(u_features), _densify(v_features), class_values,
                seed=seed, progress=progress, backend=backend,
            )
            self.packed = _PackedGraphs(graphs)
            if cache:
                self.packed.save(cache)

    def __len__(self):
        return len(self.packed)

    def get(self, i: int) -> Subgraph:
        return self.packed.get(i)

    def node_counts(self):
        return self.packed.node_counts()

    def edge_counts(self):
        return self.packed.edge_counts()


def _densify(feat):
    if feat is None:
        return None
    if hasattr(feat, "toarray"):
        return feat.toarray().astype(np.float32)
    return np.asarray(feat, dtype=np.float32)


class DynamicGraphDataset:
    """On-the-fly extraction at access time (for datasets too big to cache)."""

    def __init__(
        self,
        root: str,  # unused; kept for interface parity with StaticGraphDataset
        A,
        links,
        labels,
        h: int = 1,
        sample_ratio: float = 1.0,
        max_nodes_per_hop: Optional[int] = None,
        u_features=None,
        v_features=None,
        class_values=None,
        max_num: Optional[int] = None,
        seed: int = 0,
        backend: str = "auto",
    ):
        links, labels = _apply_max_num(links, labels, max_num)
        self.links = links
        self.labels = labels
        self.A = A if isinstance(A, BipartiteCSR) else BipartiteCSR(A)
        self.h = h
        self.sample_ratio = sample_ratio
        self.max_nodes_per_hop = max_nodes_per_hop
        self.u_features = _densify(u_features)
        self.v_features = _densify(v_features)
        self.class_values = class_values
        self.seed = seed
        self.backend = backend

    def __len__(self):
        return len(self.links[0])

    def get(self, i: int) -> Subgraph:
        # Route through get_many so get(i) == get_many([...i...])[i] exactly,
        # for whichever backend is active (the RNG stream is keyed by the
        # global dataset index in both cases).
        return self.get_many(np.asarray([i]))[0]

    def get_many(self, idxs) -> List[Subgraph]:
        idxs = np.asarray(idxs)
        links = (self.links[0][idxs], self.links[1][idxs])
        return extract_many(
            links, self.labels[idxs], self.A, self.h, self.sample_ratio,
            self.max_nodes_per_hop, self.u_features, self.v_features,
            self.class_values, seed=self.seed, backend=self.backend,
            indices=idxs,
        )


class BatchLoader:
    """Shuffled, bucketed, prefetching batch iterator.

    Yields GraphBatch with static shapes drawn from geometric ladders, so the
    number of distinct XLA compilations stays small. `device_put` places each
    batch according to `sharding` (or the default device) while the host
    prepares the next one.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        node_ladder: Optional[Sequence[int]] = None,
        edge_ladder: Optional[Sequence[int]] = None,
        device_put: bool = True,
        sharding=None,
        prefetch: int = 2,
        drop_last: bool = False,
        superbatch: int = 0,
        n_devices: int = 0,
        flat_aggregate: Optional[str] = None,
        plan_rows: int = 256,
        plan_eblk: int = 1024,
        batch_mode: str = "flat",
    ):
        if n_devices > 1 and batch_size % n_devices:
            raise ValueError(
                f"batch_size {batch_size} must divide by n_devices {n_devices}"
            )
        self.n_devices = n_devices
        # batch_mode='dense': collate into the dense-blocked layout
        # (batching/dense.py, one graph per slot, FORWARD-only edges) —
        # brings DYNAMIC datasets onto the all-MXU dense trunk (the
        # 19-24x-faster-per-step path that was previously static-only) and
        # uploads ~5x fewer bytes per edge than the doubled flat arrays.
        # Ladders are then PER-GRAPH slot shapes, not per-batch totals.
        if batch_mode not in ("flat", "dense"):
            raise ValueError(f"unknown batch_mode {batch_mode!r}")
        if batch_mode == "dense":
            if flat_aggregate not in (None, "segment", "auto"):
                raise ValueError("batch_mode='dense' conflicts with "
                                 "flat_aggregate")
            if n_devices > 1:
                raise ValueError("batch_mode='dense' does not stack "
                                 "per-device sub-batches; dense DP shards "
                                 "the batch graph axis via a `sharding` "
                                 "(dynamic) or packed gid blocks via a "
                                 "mesh (static; train/loop.py)")
        self.batch_mode = batch_mode
        # Alternate flat aggregation engines need per-batch host plans
        # (ops/blocked.py; kernels block_align_edges), attached to the batch
        # with a FIXED block count per shape bucket (one compile each).
        if flat_aggregate in (None, "segment", "auto"):
            flat_aggregate = None
        if flat_aggregate is not None:
            if n_devices > 1:
                raise ValueError(
                    f"flat_aggregate={flat_aggregate!r} is a single-device "
                    "path (DP sub-batches carry no plans)")
            superbatch = 0  # plans are not stackable across batches
        self.flat_aggregate = flat_aggregate
        self.plan_rows = plan_rows
        self.plan_eblk = plan_eblk
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.device_put = device_put
        self.sharding = sharding
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.superbatch = superbatch
        self.epoch = 0
        self.ladder_overflows = 0
        if node_ladder is None or edge_ladder is None:
            import jax

            if jax.process_count() > 1:
                # Auto-estimated ladders would be derived from each host's
                # LOCAL view (e.g. a Subset shard) and could differ between
                # processes — divergent pad shapes deadlock multi-host
                # collectives. Explicit identical ladders are mandatory
                # (igmc_tpu/parallel/multihost.py docstring).
                raise ValueError(
                    "multi-process run: pass explicit identical node_ladder/"
                    "edge_ladder on every host (see capacity_ladders); "
                    "auto-estimation from local data is host-divergent")
            nl, el = self._estimate_ladders()
            node_ladder = node_ladder or nl
            edge_ladder = edge_ladder or el
        self.node_ladder = list(node_ladder)
        self.edge_ladder = list(edge_ladder)

    def _estimate_ladders(self):
        ds = self.dataset
        if self.batch_mode == "dense":
            # per-graph slot ladders (nodes, FORWARD edges)
            if hasattr(ds, "node_counts"):
                nc, ec = ds.node_counts(), ds.edge_counts()
                if len(nc):
                    return (pad_ladder(max(int(nc.max()), 8), base=8),
                            pad_ladder(max(int(ec.max()) // 2, 8), base=8))
            n = len(ds)
            idx = np.linspace(0, n - 1, num=min(64, n), dtype=np.int64)
            samples = [ds.get(int(i)) for i in idx]
            max_n = max(g.num_nodes for g in samples)
            max_e = max(len(g.src) for g in samples)
            return (pad_ladder(max(max_n, 8), base=8),
                    pad_ladder(max(max_e, 8), base=8))
        if hasattr(ds, "node_counts"):
            nc, ec = ds.node_counts(), ds.edge_counts()
            if len(nc):
                max_n, max_e = topk_sum_bound(nc, ec, self.batch_size)
                return (
                    pad_ladder(max(max_n, 64)),
                    pad_ladder(max(max_e, 128), base=128),
                )
        # Dynamic datasets: sample a few graphs to estimate.
        n = len(ds)
        idx = np.linspace(0, n - 1, num=min(64, n), dtype=np.int64)
        samples = [ds.get(int(i)) for i in idx]
        max_n = max(g.num_nodes for g in samples) * self.batch_size
        max_e = max(g.num_edges for g in samples) * self.batch_size
        return pad_ladder(max(max_n, 64)), pad_ladder(max(max_e, 128), base=128)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n, dtype=np.int64)
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
        return rng.permutation(n).astype(np.int64)

    def _fetch(self, idxs: np.ndarray):
        if hasattr(self.dataset, "get_many"):
            return self.dataset.get_many(idxs)
        return [self.dataset.get(int(i)) for i in idxs]

    def _make_batch_dense(self, graphs):
        from .dense import collate_dense

        node_slot = self._bucket(max(g.num_nodes for g in graphs),
                                 self.node_ladder, "node-slot")
        edge_slot = self._bucket(max(len(g.src) for g in graphs),
                                 self.edge_ladder, "edge-slot")
        return collate_dense(graphs, self.batch_size, node_slot, edge_slot)

    def _make_superbatch_dense(self, idx_chunks):
        """K dense batches sharing ONE slot shape, stacked [K, B, ...]
        (stacked='superbatch') — consumed by the same scanned train step
        as flat superbatches (train/loop.py train_epoch)."""
        import jax

        from .dense import collate_dense

        graph_lists = [self._fetch(idxs) for idxs in idx_chunks]
        node_slot = self.node_ladder[-1]
        edge_slot = self.edge_ladder[-1]
        need_n = max(g.num_nodes for gs in graph_lists for g in gs)
        need_e = max(len(g.src) for gs in graph_lists for g in gs)
        if need_n > node_slot:
            node_slot = self._bucket(need_n, self.node_ladder, "node-slot")
        if need_e > edge_slot:
            edge_slot = self._bucket(need_e, self.edge_ladder, "edge-slot")
        subs = [collate_dense(gs, self.batch_size, node_slot, edge_slot)
                for gs in graph_lists]
        out = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *subs)
        out.stacked = "superbatch"
        return out

    def _make_batch(self, idxs: np.ndarray) -> GraphBatch:
        graphs = self._fetch(idxs)
        if self.batch_mode == "dense":
            return self._make_batch_dense(graphs)
        if self.n_devices > 1:
            # data parallelism: D equal sub-batches stacked on a device axis
            from ..parallel.dp import split_for_devices

            return split_for_devices(
                graphs, self.n_devices, self.batch_size // self.n_devices,
                self.node_ladder, self.edge_ladder,
            )
        total_n = sum(g.num_nodes for g in graphs)
        total_e = sum(g.num_edges for g in graphs)
        node_pad = self._bucket(total_n, self.node_ladder, "node")
        edge_pad = self._bucket(total_e, self.edge_ladder, "edge")
        if self.flat_aggregate == "pallas":
            # the Pallas kernel's output chunking needs num_nodes % rows == 0
            node_pad = -(-node_pad // self.plan_rows) * self.plan_rows
        batch = collate(graphs, self.batch_size, node_pad, edge_pad)
        if self.flat_aggregate is not None:
            self._attach_plan(batch, node_pad, edge_pad)
        return batch

    def _attach_plan(self, batch: GraphBatch, node_pad: int, edge_pad: int):
        """Attach the blocked / pallas aggregation plan for this batch,
        sized to the bucket's capacity so each (node_pad, edge_pad) bucket
        compiles exactly one program."""
        from ..ops.blocked import plan_blocked_edges, plan_capacity_blocks

        nb = plan_capacity_blocks(node_pad, edge_pad, self.plan_rows,
                                  self.plan_eblk)
        if self.flat_aggregate == "blocked":
            batch.blocked = plan_blocked_edges(
                batch.edge_src, batch.edge_dst, batch.edge_type,
                batch.edge_mask, batch.edge_canon, node_pad,
                rows=self.plan_rows, eblk=self.plan_eblk,
                num_blocks=nb, device_put=False)
        elif self.flat_aggregate == "pallas":
            from ..kernels.rgcn_aggregate import (
                block_align_edges, block_align_edges_transposed)

            out = block_align_edges(
                np.asarray(batch.edge_src), np.asarray(batch.edge_dst),
                np.asarray(batch.edge_type), np.asarray(batch.edge_mask),
                node_pad, eblk=self.plan_eblk, rows=self.plan_rows,
                num_blocks=nb, edge_canon=np.asarray(batch.edge_canon))
            # 7-tuple: (..., first_of_chunk, ukey) — ukey is the directed-
            # edge dropout key stream, enabling adj_dropout training on the
            # Pallas path (models/igmc.py recomputes the mask on device).
            batch.aligned = tuple(out[:6]) + (out[7],)
            # src-sorted twin plan (same capacity -> one program per
            # bucket): lets the backward dx run as the same Pallas kernel
            # (rgcn_aggregate_pallas_train)
            out_t = block_align_edges_transposed(
                np.asarray(batch.edge_src), np.asarray(batch.edge_dst),
                np.asarray(batch.edge_type), np.asarray(batch.edge_mask),
                node_pad, eblk=self.plan_eblk, rows=self.plan_rows,
                num_blocks=nb, edge_canon=np.asarray(batch.edge_canon))
            batch.aligned_t = tuple(out_t[:6]) + (out_t[7],)
        else:
            raise ValueError(f"unknown flat_aggregate "
                             f"{self.flat_aggregate!r}")

    def _bucket(self, n: int, ladder, which: str) -> int:
        """bucket_for with overflow telemetry: a batch above the ladder mints
        a new size by EXTENDING the ladder geometrically (so the shape is
        remembered and reused — one recompile per extension step, not one
        per batch) and counts/logs the event. A power-law dynamic dataset
        whose sampled estimate ran low therefore converges to a few extra
        shapes instead of silently recompiling every batch."""
        if n <= ladder[-1]:
            return bucket_for(n, ladder)
        import logging

        before = ladder[-1]
        while ladder[-1] < n:
            ladder.append(int(np.ceil(ladder[-1] * 1.5 / 8.0)) * 8)
        self.ladder_overflows += 1
        logging.getLogger("igmc_tpu.batching").warning(
            "%s ladder overflow #%d: batch needs %d > %d; extended to %d "
            "(new XLA compile)", which, self.ladder_overflows, n, before,
            ladder[-1])
        return ladder[-1]

    def _make_superbatch(self, idx_chunks) -> GraphBatch:
        """Collate K index chunks into one common bucket and stack on a
        leading axis [K, ...] — one device upload + one scanned dispatch
        covers K training steps (amortizes per-step host/tunnel overhead)."""
        from ..parallel.dp import stack_batches

        graph_lists = [self._fetch(idxs) for idxs in idx_chunks]
        # One FIXED shape for every superbatch (the ladder maximum): the
        # scanned step then compiles exactly once; the padding waste is ~1.5x
        # device compute, far cheaper than per-shape recompiles.
        node_pad = self.node_ladder[-1]
        edge_pad = self.edge_ladder[-1]
        need_n = max(sum(g.num_nodes for g in gs) for gs in graph_lists)
        need_e = max(sum(g.num_edges for g in gs) for gs in graph_lists)
        # Ladder estimate too low: grow ONLY the overflowing dimension, so
        # the other stays at the fixed maximum and shape churn (= scan
        # recompiles) is bounded to one extra shape per overflow axis.
        if need_n > node_pad:
            node_pad = self._bucket(need_n, self.node_ladder, "node")
        if need_e > edge_pad:
            edge_pad = self._bucket(need_e, self.edge_ladder, "edge")
        subs = [collate(gs, self.batch_size, node_pad, edge_pad)
                for gs in graph_lists]
        return stack_batches(subs)

    def _make_superbatch_dp(self, idx_chunks) -> GraphBatch:
        """K device-stacked batches stacked again on a leading scan axis
        [K, D, ...] (kind 'superbatch_devices') — one dispatch runs K
        data-parallel steps (parallel/dp.py make_dp_scan_train_step). All
        K stacks share ONE (node_pad, edge_pad) so the scan is
        rectangular."""
        from ..parallel.dp import split_for_devices, stack_batches

        D = self.n_devices
        pdg = self.batch_size // D
        graph_lists = [self._fetch(idxs) for idxs in idx_chunks]
        need_n = need_e = 1
        for gs in graph_lists:
            for d in range(D):
                c = gs[d * pdg:(d + 1) * pdg]
                need_n = max(need_n, sum(g.num_nodes for g in c))
                need_e = max(need_e, sum(g.num_edges for g in c))
        node_pad = max(self.node_ladder[-1],
                       self._bucket(need_n, self.node_ladder, "node"))
        edge_pad = max(self.edge_ladder[-1],
                       self._bucket(need_e, self.edge_ladder, "edge"))
        subs = [split_for_devices(gs, D, pdg, [node_pad], [edge_pad])
                for gs in graph_lists]
        return stack_batches(subs, kind="superbatch_devices")

    def _tasks(self, order: np.ndarray):
        """The epoch's work items: thunks producing one (super)batch each."""
        B = self.batch_size
        n = len(order)
        stop = (n // B) * B if self.drop_last else n
        starts = list(range(0, stop, B))
        tasks = []
        if self.superbatch > 1:
            K = self.superbatch
            maker = (self._make_superbatch_dense
                     if self.batch_mode == "dense"
                     else self._make_superbatch_dp if self.n_devices > 1
                     else self._make_superbatch)
            for g in range(0, len(starts) - len(starts) % K, K):
                chunks = [order[s : s + B] for s in starts[g : g + K]]
                tasks.append((maker, chunks))
            starts = starts[len(starts) - len(starts) % K :]
        for s in starts:
            tasks.append((self._make_batch, order[s : s + B]))
        return tasks

    def _produce(self, order: np.ndarray) -> Iterator[GraphBatch]:
        for fn, arg in self._tasks(order):
            yield fn(arg)

    def __iter__(self) -> Iterator[GraphBatch]:
        order = self._order()
        self.epoch += 1
        if self.prefetch <= 0:
            for b in self._produce(order):
                yield self._put(b)
            return
        # Collate+upload each work item on a small thread pool, preserving
        # batch order via a bounded deque of futures — extraction/collation
        # (numpy, GIL-releasing) and device_put overlap the training
        # dispatches on the main thread.
        import concurrent.futures as cf
        from collections import deque

        tasks = self._tasks(order)
        with cf.ThreadPoolExecutor(max_workers=max(1, min(self.prefetch, 4))) as ex:
            pending: deque = deque()
            i = 0
            while i < len(tasks) or pending:
                while i < len(tasks) and len(pending) < self.prefetch + 1:
                    fn, arg = tasks[i]
                    pending.append(ex.submit(lambda f=fn, a=arg: self._put(f(a))))
                    i += 1
                yield pending.popleft().result()

    def _put(self, batch: GraphBatch):
        if not self.device_put:
            return batch
        import jax

        # device_put leaf-by-leaf: a single pytree-level device_put takes a
        # batched-transfer path that is orders of magnitude slower on remote
        # (tunneled) TPU backends; per-leaf puts of these small arrays
        # pipeline at full speed.
        shd = self.sharding
        if (shd is not None
                and getattr(batch, "stacked", None) in ("superbatch_devices",
                                                        "superbatch")):
            # [K, D, ...] device stacks / [K, B, ...] dense scan stacks:
            # the sharded axis moves to dim 1 behind the scan axis
            from jax.sharding import NamedSharding, PartitionSpec

            shd = NamedSharding(shd.mesh, PartitionSpec(None, *shd.spec))

        def put(x):
            return x if x is None else jax.device_put(
                x, shd) if shd is not None else jax.device_put(x)

        return jax.tree_util.tree_map(put, batch, is_leaf=lambda x: x is None)
