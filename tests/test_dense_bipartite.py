"""Bipartite dense slot layout (batching/dense.py DenseBatch.num_u):
parity with the unified dense layout and the flat segment path on
identical graphs — the one-hot widths halve, the math must not change.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igmc_tpu.batching.batch import collate
from igmc_tpu.batching.dense import (
    collate_dense, plan_bipartite_buckets, plan_dense_buckets,
)
from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
from igmc_tpu.models.rgcn import (
    rgcn_dense_apply, rgcn_dense_bipartite_apply, rgcn_init,
)

from tests.test_dense import make_pair, random_subgraph


def make_bipartite(rng, n_graphs=6, num_relations=5, side=None):
    """The same graphs collated flat, unified-dense and bipartite-dense."""
    graphs, flat, dense = make_pair(rng, n_graphs, num_relations, side)
    nu = max(g.num_u for g in graphs) + 2
    nv = max(g.num_v for g in graphs) + 3
    es = dense.edge_slot
    bip = collate_dense(graphs, n_graphs + 1, nu + nv, es, num_u_slot=nu)
    return graphs, flat, dense, bip


def test_collate_bipartite_layout():
    rng = np.random.default_rng(0)
    graphs, _, _, bip = make_bipartite(rng)
    nu = bip.num_u
    for gi, g in enumerate(graphs):
        # users in rows [0, num_u), items in [nu, nu+num_v)
        assert bip.node_mask[gi, :g.num_u].all()
        assert not bip.node_mask[gi, g.num_u:nu].any()
        assert bip.node_mask[gi, nu:nu + g.num_v].all()
        assert not bip.node_mask[gi, nu + g.num_v:].any()
        # target labels at static rows: user label 0 at row 0, item label
        # 1 at row nu (extraction puts targets first on each side)
        assert bip.node_label[gi, 0] == 0
        assert bip.node_label[gi, nu] == 1
        ne = len(g.src)
        assert (bip.edge_src[gi, :ne] < nu).all()
        assert (bip.edge_dst[gi, :ne] >= nu).all()
        # padded edges point at a valid item row (one_hot range safety)
        assert (bip.edge_dst[gi, ne:] == nu).all()
    # padding graphs too
    assert not bip.graph_mask[-1]
    assert (bip.edge_dst[-1] == nu).all()


@pytest.mark.parametrize("aggr", ["mean", "sum", "relmean"])
def test_layer_parity_vs_unified(aggr):
    rng = np.random.default_rng(1)
    _, _, dense, bip = make_bipartite(rng, n_graphs=5)
    key = jax.random.PRNGKey(0)
    # one-hot label features (what IGMC actually feeds) give both layouts
    # the same per-node inputs without a row map
    xd = jax.nn.one_hot(dense.node_label, 8) * dense.node_mask[..., None]
    xb = jax.nn.one_hot(bip.node_label, 8) * bip.node_mask[..., None]
    params = rgcn_init(key, 8, 16, 5, 4)
    out_d = rgcn_dense_apply(params, xd, dense.edge_src, dense.edge_dst,
                             dense.edge_type, dense.edge_mask,
                             dense.edge_mask, aggr)
    out_b = rgcn_dense_bipartite_apply(
        params, xb, bip.num_u, bip.edge_src, bip.edge_dst, bip.edge_type,
        bip.edge_mask, bip.edge_mask, aggr)
    # compare target rows (present in both layouts at known positions)
    np.testing.assert_allclose(out_d[:, 0], out_b[:, 0], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(out_d[:, 1], out_b[:, bip.num_u], rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("aggr", ["mean", "sum", "relmean"])
def test_forward_parity_flat_vs_bipartite(aggr):
    rng = np.random.default_rng(2)
    graphs, flat, dense, bip = make_bipartite(rng, n_graphs=6)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0,
                     aggr=aggr)
    params = igmc_init(jax.random.PRNGKey(3), cfg)
    out_flat = igmc_forward(params, flat, cfg)
    out_dense = igmc_forward(params, dense, cfg)
    out_bip = igmc_forward(params, bip, cfg)
    B = len(graphs)
    np.testing.assert_allclose(out_flat[:B], out_bip[:B], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(out_dense[:B], out_bip[:B], rtol=1e-4,
                               atol=1e-5)


def test_forward_parity_side_features():
    rng = np.random.default_rng(3)
    graphs, flat, dense, bip = make_bipartite(rng, n_graphs=4, side=5)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0,
                     side_features=True, n_side_features=10)
    params = igmc_init(jax.random.PRNGKey(4), cfg)
    out_flat = igmc_forward(params, flat, cfg)
    out_bip = igmc_forward(params, bip, cfg)
    B = len(graphs)
    np.testing.assert_allclose(out_flat[:B], out_bip[:B], rtol=1e-4,
                               atol=1e-5)


def test_grad_parity_vs_unified():
    rng = np.random.default_rng(4)
    graphs, _, dense, bip = make_bipartite(rng, n_graphs=5)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(5), cfg)
    B = len(graphs)

    def loss(p, batch):
        out = igmc_forward(p, batch, cfg)
        m = batch.graph_mask.astype(jnp.float32)
        return jnp.sum((out - batch.y) ** 2 * m) / m.sum()

    gd = jax.grad(loss)(params, dense)
    gb = jax.grad(loss)(params, bip)
    for leaf_d, leaf_b in zip(jax.tree_util.tree_leaves(gd),
                              jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(leaf_d, leaf_b, rtol=1e-4, atol=1e-5)


def test_bf16_compute_dtype_close():
    rng = np.random.default_rng(5)
    graphs, _, dense, bip = make_bipartite(rng, n_graphs=5)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0,
                     compute_dtype="bfloat16")
    params = igmc_init(jax.random.PRNGKey(6), cfg)
    B = len(graphs)
    out_dense = igmc_forward(params, dense, cfg)
    out_bip = igmc_forward(params, bip, cfg)
    np.testing.assert_allclose(out_dense[:B], out_bip[:B], rtol=2e-2,
                               atol=2e-2)


def test_dropout_runs_and_masks_padding():
    rng = np.random.default_rng(6)
    _, _, _, bip = make_bipartite(rng, n_graphs=5)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.5,
                     force_undirected=True)
    params = igmc_init(jax.random.PRNGKey(7), cfg)
    out = igmc_forward(params, bip, cfg, key=jax.random.PRNGKey(8),
                       training=True)
    assert np.isfinite(np.asarray(out)).all()


def test_plan_bipartite_buckets_fit_and_cost():
    rng = np.random.default_rng(7)
    graphs = [random_subgraph(rng) for _ in range(300)]
    uc = np.array([g.num_u for g in graphs])
    vc = np.array([g.num_v for g in graphs])
    ec = np.array([len(g.src) for g in graphs])
    buckets = plan_bipartite_buckets(uc, vc, ec, max_buckets=3)
    seen = np.concatenate([b.indices for b in buckets])
    assert sorted(seen.tolist()) == list(range(len(graphs)))
    for b in buckets:
        nu = b.num_u_slot
        nv = b.node_slot - nu
        assert nu % 8 == 0 and nv % 8 == 0 and b.edge_slot % 8 == 0
        assert (uc[b.indices] <= nu).all()
        assert (vc[b.indices] <= nv).all()
        assert (ec[b.indices] <= b.edge_slot).all()
        # every member collates without error
        members = [graphs[i] for i in b.indices[:4]]
        collate_dense(members, len(members), b.node_slot, b.edge_slot,
                      num_u_slot=nu)


def test_chunked_bipartite_forward():
    from igmc_tpu.models.igmc import igmc_forward_dense_chunked

    rng = np.random.default_rng(8)
    graphs = [random_subgraph(rng) for _ in range(8)]
    nu = max(g.num_u for g in graphs) + 1
    nv = max(g.num_v for g in graphs) + 1
    es = max(len(g.src) for g in graphs) + 2
    bip = collate_dense(graphs, 8, nu + nv, es, num_u_slot=nu)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(9), cfg)
    full = igmc_forward(params, bip, cfg)
    chunked = igmc_forward_dense_chunked(params, bip, cfg, chunk=4)
    np.testing.assert_allclose(full, chunked, rtol=1e-5, atol=1e-6)


def test_assemble_dense_bipartite_matches_collate():
    """assemble_dense(num_u_slot) on device reproduces the host bipartite
    collate for the same graphs (targets, edges, labels, masks)."""
    from tests.test_regression import _toy_dataset
    from igmc_tpu.batching.device_data import DeviceDataset, assemble_dense

    ds, _ = _toy_dataset(seed=9, n_links=24)
    nu = int(ds.packed.num_u.max()) + 2
    nv = int((ds.node_counts() - ds.packed.num_u).max()) + 3
    es = int(ds.edge_counts().max() // 2) + 2
    dd = DeviceDataset(ds.packed, 8, 16, 8)
    gids = np.array([0, 3, 5, 7, 1, -1, 2, 4], np.int32)
    dev = assemble_dense(dd, jax.numpy.asarray(gids), nu + nv, es,
                         num_u_slot=nu)
    graphs = [ds.get(int(i)) for i in gids if i >= 0]
    order = [gi for gi, i in enumerate(gids) if i >= 0]
    host = collate_dense(graphs, len(gids), nu + nv, es, num_u_slot=nu)
    # host packs real graphs first; device keeps them at their gid rows
    for hi, di in enumerate(order):
        np.testing.assert_array_equal(host.node_label[hi],
                                      np.asarray(dev.node_label)[di])
        np.testing.assert_array_equal(host.node_mask[hi],
                                      np.asarray(dev.node_mask)[di])
        em = host.edge_mask[hi]
        np.testing.assert_array_equal(em, np.asarray(dev.edge_mask)[di])
        np.testing.assert_array_equal(host.edge_src[hi][em],
                                      np.asarray(dev.edge_src)[di][em])
        np.testing.assert_array_equal(host.edge_dst[hi][em],
                                      np.asarray(dev.edge_dst)[di][em])
        np.testing.assert_array_equal(host.edge_type[hi][em],
                                      np.asarray(dev.edge_type)[di][em])
        assert host.y[hi] == pytest.approx(float(dev.y[di]))
    # padding rows carry no graph
    pad_rows = [gi for gi, i in enumerate(gids) if i < 0]
    for di in pad_rows:
        assert not np.asarray(dev.node_mask)[di].any()
        assert not np.asarray(dev.edge_mask)[di].any()
    assert dev.num_u == nu


def test_test_once_bipartite_matches_unified():
    """test_once(dense_layout='bipartite') is batching-invariant: the same
    params give the same RMSE as the unified dense and flat paths."""
    from tests.test_regression import _toy_dataset
    from igmc_tpu.train import test_once

    test_ds, _ = _toy_dataset(seed=6, n_links=32)
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(2), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    r_bip = test_once(test_ds, fwd, params, batch_size=16,
                      batch_mode="dense", dense_layout="bipartite")
    r_uni = test_once(test_ds, fwd, params, batch_size=16,
                      batch_mode="dense")
    r_flat = test_once(test_ds, fwd, params, batch_size=16,
                       batch_mode="flat")
    assert r_bip == pytest.approx(r_uni, abs=1e-4)
    assert r_bip == pytest.approx(r_flat, abs=1e-4)


def test_train_end_to_end_bipartite():
    """train_multiple_epochs(dense_layout='bipartite') trains to a sane
    RMSE through the device-resident per-bucket scan steps."""
    from tests.test_regression import _toy_dataset
    from igmc_tpu.train import train_multiple_epochs

    train_ds, _ = _toy_dataset(seed=5, n_links=64)
    test_ds, _ = _toy_dataset(seed=6, n_links=32)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    rmse, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg),
        epochs=6, batch_size=16, lr=1e-2, lr_decay_factor=0.1,
        lr_decay_step_size=20, ARR=0.001, test_freq=2, seed=11,
        progress=False, superbatch=4, batch_mode="dense",
        dense_layout="bipartite")
    # same ballpark as the unified golden (1.6546); composition differs
    # (bipartite bucket membership), math doesn't
    assert 1.0 < rmse < 2.2, rmse


# ---------------------------------------------------------------------------
# Relation-slotted edge axis (DenseBatch.rel_caps)
# ---------------------------------------------------------------------------

def make_relslot(rng, n_graphs=6, num_relations=5, bipartite=False):
    from igmc_tpu.batching.dense import plan_rel_caps

    graphs = [random_subgraph(rng, num_relations=num_relations)
              for _ in range(n_graphs)]
    caps = plan_rel_caps([g.etype for g in graphs], num_relations)
    ns = max(g.num_nodes for g in graphs) + 3
    dense = collate_dense(graphs, n_graphs + 1, ns,
                          max(len(g.src) for g in graphs) + 5)
    kw = {}
    if bipartite:
        nu = max(g.num_u for g in graphs) + 2
        nv = max(g.num_v for g in graphs) + 3
        ns = nu + nv
        kw["num_u_slot"] = nu
    rel = collate_dense(graphs, n_graphs + 1, ns, sum(caps),
                        rel_caps=caps, **kw)
    return graphs, dense, rel


def test_collate_relslot_layout():
    rng = np.random.default_rng(10)
    graphs, _, rel = make_relslot(rng)
    caps = rel.rel_caps
    offs = np.concatenate([[0], np.cumsum(caps)])
    for gi, g in enumerate(graphs):
        for r in range(5):
            seg_types = rel.edge_type[gi, offs[r]:offs[r + 1]]
            assert (seg_types == r).all()  # real AND padded positions
            n_real = int(rel.edge_mask[gi, offs[r]:offs[r + 1]].sum())
            assert n_real == int((g.etype == r).sum())
    assert int(rel.edge_mask.sum()) == sum(len(g.src) for g in graphs)


@pytest.mark.parametrize("aggr", ["mean", "sum"])
@pytest.mark.parametrize("bipartite", [False, True])
def test_relslot_forward_matches_dense(aggr, bipartite):
    rng = np.random.default_rng(11)
    graphs, dense, rel = make_relslot(rng, bipartite=bipartite)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0,
                     aggr=aggr)
    params = igmc_init(jax.random.PRNGKey(12), cfg)
    out_dense = igmc_forward(params, dense, cfg)
    out_rel = igmc_forward(params, rel, cfg)
    B = len(graphs)
    np.testing.assert_allclose(out_dense[:B], out_rel[:B], rtol=1e-4,
                               atol=1e-5)


def test_relslot_grad_matches_dense():
    rng = np.random.default_rng(12)
    graphs, dense, rel = make_relslot(rng)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(13), cfg)

    def loss(p, batch):
        out = igmc_forward(p, batch, cfg)
        m = batch.graph_mask.astype(jnp.float32)
        return jnp.sum((out - batch.y) ** 2 * m) / m.sum()

    gd = jax.grad(loss)(params, dense)
    gr = jax.grad(loss)(params, rel)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_relslot_dropout_trains_finite():
    rng = np.random.default_rng(13)
    _, _, rel = make_relslot(rng, bipartite=True)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.5)
    params = igmc_init(jax.random.PRNGKey(14), cfg)
    out = igmc_forward(params, rel, cfg, key=jax.random.PRNGKey(15),
                       training=True)
    assert np.isfinite(np.asarray(out)).all()


def test_relslot_relmean_raises():
    rng = np.random.default_rng(14)
    _, _, rel = make_relslot(rng)
    cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0,
                     aggr="relmean")
    params = igmc_init(jax.random.PRNGKey(16), cfg)
    with pytest.raises(ValueError, match="relslot"):
        igmc_forward(params, rel, cfg)


def test_assemble_dense_relslot_matches_collate():
    """assemble_dense(rel_caps) with a rel-sorted DeviceDataset reproduces
    the host relation-slotted collate (both layouts)."""
    from tests.test_regression import _toy_dataset
    from igmc_tpu.batching.dense import plan_rel_caps
    from igmc_tpu.batching.device_data import DeviceDataset, assemble_dense

    ds, _ = _toy_dataset(seed=9, n_links=24)
    graphs_all = [ds.get(i) for i in range(len(ds))]
    caps = plan_rel_caps([g.etype for g in graphs_all], 5)
    E = sum(caps)
    nu = int(ds.packed.num_u.max()) + 2
    nv = int((ds.node_counts() - ds.packed.num_u).max()) + 3
    for num_u_slot, n in ((None, nu + nv), (nu, nu + nv)):
        dd = DeviceDataset(ds.packed, 8, 16, 8, rel_sort=5)
        gids = np.array([0, 3, 5, 7, 1, -1, 2, 4], np.int32)
        dev = assemble_dense(dd, jax.numpy.asarray(gids), n, E,
                             num_u_slot=num_u_slot, rel_caps=caps)
        graphs = [ds.get(int(i)) for i in gids if i >= 0]
        order = [gi for gi, i in enumerate(gids) if i >= 0]
        host = collate_dense(graphs, len(gids), n, E,
                             num_u_slot=num_u_slot, rel_caps=caps)
        for hi, di in enumerate(order):
            np.testing.assert_array_equal(host.node_label[hi],
                                          np.asarray(dev.node_label)[di])
            em_h = host.edge_mask[hi]
            em_d = np.asarray(dev.edge_mask)[di]
            np.testing.assert_array_equal(em_h, em_d)
            # within each relation segment the edge SET matches (the host
            # collate preserves input order, the device the sorted order —
            # same segment, same set)
            offs = np.concatenate([[0], np.cumsum(caps)])
            for r in range(5):
                seg = slice(offs[r], offs[r + 1])
                hs = set(zip(host.edge_src[hi, seg][em_h[seg]].tolist(),
                             host.edge_dst[hi, seg][em_h[seg]].tolist()))
                dsg = set(zip(
                    np.asarray(dev.edge_src)[di, seg][em_d[seg]].tolist(),
                    np.asarray(dev.edge_dst)[di, seg][em_d[seg]].tolist()))
                assert hs == dsg
        assert dev.rel_caps == tuple(caps)
        # forward parity through the model
        cfg = IGMCConfig(num_relations=5, num_bases=4)
        params = igmc_init(jax.random.PRNGKey(2), cfg)
        out_d = igmc_forward(params, dev, cfg)
        out_h = igmc_forward(params, host, cfg)
        got = np.asarray(out_d)[order]
        np.testing.assert_allclose(got, np.asarray(out_h)[:len(order)],
                                   rtol=1e-4, atol=1e-5)


def test_relslot_device_train_step_runs():
    """make_dense_device_train_step(rel_caps) trains finite on the
    rel-sorted device dataset."""
    from tests.test_regression import _toy_dataset
    from igmc_tpu.batching.dense import plan_rel_caps
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.train.loop import (make_dense_device_train_step,
                                     make_optimizer)

    ds, _ = _toy_dataset(seed=5, n_links=32)
    graphs_all = [ds.get(i) for i in range(len(ds))]
    caps = plan_rel_caps([g.etype for g in graphs_all], 5)
    n = int(ds.node_counts().max()) + 2
    dd = DeviceDataset(ds.packed, 8, 16, 8, rel_sort=5)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(3), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-3)
    step = make_dense_device_train_step(fwd, opt, n, sum(caps), ARR=0.001,
                                        rel_caps=caps)
    blk = np.arange(16, dtype=np.int32).reshape(2, 8)
    p, s = params, opt.init(params)
    p, s, loss_acc, ns = step(p, s, np.zeros((), np.float32), dd,
                              jax.numpy.asarray(blk),
                              jax.random.PRNGKey(1), jax.numpy.int32(0))
    assert np.isfinite(float(loss_acc))
