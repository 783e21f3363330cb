"""Batching/padding invariance tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.batching import collate, bucket_for, pad_ladder
from igmc_tpu.batching.dataset import StaticGraphDataset, BatchLoader


def make_graphs(n=6, seed=0):
    rng = np.random.default_rng(seed)
    M = (rng.random((15, 15)) < 0.5).astype(np.float32) * rng.integers(
        1, 6, (15, 15)
    ).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    return extract_many((us[:n], vs[:n]), labels[:n], A, h=1,
                        class_values=cv, backend="numpy"), M


def test_collate_shapes_and_masks():
    graphs, _ = make_graphs(4)
    total_n = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    b = collate(graphs, num_graphs=6, node_pad=total_n + 10, edge_pad=total_e + 8)
    assert b.node_mask.sum() == total_n
    assert b.edge_mask.sum() == total_e
    assert b.graph_mask.sum() == 4
    # every real edge endpoint is a real node of the same graph
    em = b.edge_mask
    assert (b.node2graph[b.edge_src[em]] == b.node2graph[b.edge_dst[em]]).all()
    # targets are real nodes with labels 0 (user) and 1 (item)
    gm = b.graph_mask
    assert (b.node_label[b.target_u[gm]] == 0).all()
    assert (b.node_label[b.target_v[gm]] == 1).all()


def test_collate_edge_canon_pairs():
    graphs, _ = make_graphs(3)
    b = collate(graphs, 3, 200, 400)
    em = np.asarray(b.edge_mask)
    canon = np.asarray(b.edge_canon)
    src, dst = np.asarray(b.edge_src), np.asarray(b.edge_dst)
    for e in np.nonzero(em)[0]:
        c = canon[e]
        # canonical edge is the forward copy: same pair, maybe swapped
        assert {src[e], dst[e]} == {src[c], dst[c]}
        assert em[c]


def test_collate_overflow_raises():
    graphs, _ = make_graphs(4)
    with pytest.raises(ValueError):
        collate(graphs, 4, 2, 2)


def test_bucket_ladder():
    ladder = pad_ladder(1000, base=64)
    assert ladder[0] == 64 and ladder[-1] >= 1000
    assert bucket_for(65, ladder) >= 65
    assert bucket_for(1, ladder) == 64
    # all sizes multiple of 8 (TPU sublane alignment)
    assert all(s % 8 == 0 for s in ladder)


def test_static_dataset_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    M = (rng.random((12, 12)) < 0.5).astype(np.float32) * rng.integers(
        1, 4, (12, 12)
    ).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 4.0)
    root = str(tmp_path / "ds")
    ds1 = StaticGraphDataset(root, A, (us, vs), labels, h=1, class_values=cv,
                             backend="numpy")
    ds2 = StaticGraphDataset(root, A, (us, vs), labels, h=1, class_values=cv,
                             backend="numpy")  # loads from cache
    assert len(ds1) == len(ds2) == len(us)
    for i in (0, len(ds1) - 1):
        g1, g2 = ds1.get(i), ds2.get(i)
        np.testing.assert_array_equal(g1.src, g2.src)
        np.testing.assert_array_equal(g1.node_label, g2.node_label)
        assert g1.y == g2.y


def test_max_num_subsample_seed123(tmp_path):
    # The max_num subsample must use np.random.seed(123) permutation
    # (/root/reference/util_functions.py:84-90).
    rng = np.random.default_rng(3)
    M = (rng.random((12, 12)) < 0.6).astype(np.float32) * rng.integers(
        1, 4, (12, 12)
    ).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 4.0)
    ds = StaticGraphDataset(str(tmp_path / "d"), A, (us, vs), labels, h=1,
                            class_values=cv, max_num=5, backend="numpy")
    assert len(ds) == 5
    np.random.seed(123)
    perm = np.random.permutation(len(us))[:5]
    expected_y = cv[labels[perm]]
    np.testing.assert_allclose(ds.packed.y, expected_y.astype(np.float32))


def test_batch_loader_covers_dataset(tmp_path):
    rng = np.random.default_rng(5)
    M = (rng.random((12, 12)) < 0.6).astype(np.float32) * rng.integers(
        1, 4, (12, 12)
    ).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 4.0)
    ds = StaticGraphDataset(str(tmp_path / "d"), A, (us, vs), labels, h=1,
                            class_values=cv, backend="numpy")
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=1,
                         device_put=False)
    seen = 0
    ys = []
    for b in loader:
        seen += int(b.graph_mask.sum())
        ys.append(np.asarray(b.y)[np.asarray(b.graph_mask)])
    assert seen == len(ds)
    # shuffled epoch 2 differs from epoch 1 but covers the same multiset
    ys2 = []
    for b in loader:
        ys2.append(np.asarray(b.y)[np.asarray(b.graph_mask)])
    a, c = np.concatenate(ys), np.concatenate(ys2)
    assert sorted(a.tolist()) == sorted(c.tolist())


def test_dynamic_matches_static_dataset():
    """DynamicGraphDataset.get(i) must return the same subgraph the static
    path extracts for link i (shared (seed, i) RNG streams)."""
    from igmc_tpu.batching import DynamicGraphDataset, StaticGraphDataset

    rng = np.random.default_rng(5)
    M = (rng.random((40, 40)) < 0.5).astype(np.float32) * rng.integers(
        1, 6, (40, 40)).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    links = (us[:30], vs[:30])
    kw = dict(h=1, sample_ratio=0.7, max_nodes_per_hop=5, class_values=cv,
              seed=3, backend="numpy")
    static = StaticGraphDataset(None, A, links, labels[:30], **kw)
    dyn = DynamicGraphDataset(None, A, links, labels[:30], **kw)
    assert len(static) == len(dyn) == 30
    for i in (0, 7, 29):
        a, b = static.get(i), dyn.get(i)
        np.testing.assert_array_equal(a.node_label, b.node_label)
        np.testing.assert_array_equal(a.src, b.src)
        np.testing.assert_array_equal(a.dst, b.dst)
        np.testing.assert_array_equal(a.etype, b.etype)
        assert a.y == b.y

    # Batch extraction keys RNG streams by GLOBAL dataset index, so the
    # subgraph for link i is identical whatever batch it lands in.
    shuffled = dyn.get_many(np.array([29, 7, 0]))
    for pos, i in enumerate((29, 7, 0)):
        a, b = dyn.get(i), shuffled[pos]
        np.testing.assert_array_equal(a.node_label, b.node_label)
        np.testing.assert_array_equal(a.src, b.src)
        np.testing.assert_array_equal(a.dst, b.dst)


def test_dynamic_get_many_global_seed_native():
    """Same contract through the C++ engine (its own RNG streams, also keyed
    by global index)."""
    from igmc_tpu.graphs import native
    if not native.available():
        pytest.skip("native engine unavailable")
    from igmc_tpu.batching import DynamicGraphDataset

    rng = np.random.default_rng(11)
    M = (rng.random((40, 40)) < 0.5).astype(np.float32) * rng.integers(
        1, 6, (40, 40)).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    links = (us[:30], vs[:30])
    dyn = DynamicGraphDataset(None, A, links, labels[:30], h=1,
                              sample_ratio=0.6, max_nodes_per_hop=4,
                              class_values=np.arange(1.0, 6.0), seed=9,
                              backend="native")
    shuffled = dyn.get_many(np.array([12, 3, 25]))
    for pos, i in enumerate((12, 3, 25)):
        a, b = dyn.get(i), shuffled[pos]
        np.testing.assert_array_equal(a.node_label, b.node_label)
        np.testing.assert_array_equal(a.src, b.src)
        np.testing.assert_array_equal(a.dst, b.dst)


def test_static_cache_keyed_by_extraction_params(tmp_path):
    """Changing h (or any extraction knob) must NOT reuse a stale cache
    (the reference's fixed data.pt silently did)."""
    rng = np.random.default_rng(2)
    M = (rng.random((30, 30)) < 0.6).astype(np.float32) * rng.integers(
        1, 6, (30, 30)).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    links = (us[:20], vs[:20])
    kw = dict(class_values=np.arange(1.0, 6.0), backend="numpy")
    root = str(tmp_path / "ds")
    h1 = StaticGraphDataset(root, A, links, labels[:20], h=1, **kw)
    h2 = StaticGraphDataset(root, A, links, labels[:20], h=2, **kw)
    assert sum(h2.node_counts()) > sum(h1.node_counts())
    # and the h=1 rerun still hits its own cache (one file per key)
    again = StaticGraphDataset(root, A, links, labels[:20], h=1, **kw)
    np.testing.assert_array_equal(again.node_counts(), h1.node_counts())


def test_packed_cache_uncompressed_roundtrip(tmp_path, monkeypatch):
    """Giant datasets skip zlib on the .npz cache (a full-scale ml_1m
    write took tens of minutes compressed); load() reads both formats."""
    import igmc_tpu.batching.dataset as dsmod
    from igmc_tpu.batching.dataset import _PackedGraphs

    graphs, _ = make_graphs(6)
    packed = _PackedGraphs(graphs)
    monkeypatch.setattr(dsmod, "NPZ_COMPRESS_MAX_BYTES", 0)
    p = str(tmp_path / "big.npz")
    packed.save(p)
    back = _PackedGraphs.load(p)
    np.testing.assert_array_equal(back.src, packed.src)
    np.testing.assert_array_equal(back.node_offsets, packed.node_offsets)
    np.testing.assert_array_equal(back.y, packed.y)
