"""Dense-blocked layout (batching/dense.py, rgcn_dense_apply): parity with
the flat segment path on identical graphs — forward, gradients, every aggr,
side features, bucketing invariants, and dropout mask semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igmc_tpu.batching.batch import collate
from igmc_tpu.batching.dense import (
    DenseBatch, collate_dense, plan_dense_buckets, slot_perm,
)
from igmc_tpu.graphs.extract import Subgraph
from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init


def random_subgraph(rng, num_u=None, num_v=None, num_relations=5, side=None):
    num_u = num_u or int(rng.integers(1, 9))
    num_v = num_v or int(rng.integers(1, 9))
    n_pairs = num_u * num_v
    ne = int(rng.integers(1, n_pairs + 1))
    pairs = rng.choice(n_pairs, size=ne, replace=False)
    src = (pairs // num_v).astype(np.int32)
    dst = (pairs % num_v).astype(np.int32) + num_u
    labels = np.minimum(
        rng.integers(0, 4, size=num_u + num_v) * 2
        + (np.arange(num_u + num_v) >= num_u), 7).astype(np.int32)
    labels[0], labels[num_u] = 0, 1
    return Subgraph(
        src=src, dst=dst,
        etype=rng.integers(0, num_relations, size=ne).astype(np.int32),
        node_label=labels, num_u=num_u, num_v=num_v,
        y=float(rng.uniform(0.5, 5.0)),
        u_feat=(rng.standard_normal(side).astype(np.float32)
                if side else None),
        v_feat=(rng.standard_normal(side).astype(np.float32)
                if side else None),
    )


def make_pair(rng, n_graphs=6, num_relations=5, side=None):
    """The same graphs collated both ways."""
    graphs = [random_subgraph(rng, num_relations=num_relations, side=side)
              for _ in range(n_graphs)]
    tn = sum(g.num_nodes for g in graphs)
    te = sum(g.num_edges for g in graphs)
    flat = collate(graphs, n_graphs + 1, tn + 8, te + 16)
    ns = max(g.num_nodes for g in graphs) + 3
    es = max(len(g.src) for g in graphs) + 5
    dense = collate_dense(graphs, n_graphs + 1, ns, es)
    return graphs, flat, dense


def test_collate_dense_layout():
    rng = np.random.default_rng(0)
    graphs, _, dense = make_pair(rng)
    for gi, g in enumerate(graphs):
        nn, ne = g.num_nodes, len(g.src)
        assert dense.node_mask[gi, :nn].all()
        assert not dense.node_mask[gi, nn:].any()
        assert dense.edge_mask[gi, :ne].all()
        assert not dense.edge_mask[gi, ne:].any()
        # targets at rows 0/1 carry the target labels (0 = user, 1 = item)
        assert dense.node_label[gi, 0] == 0
        assert dense.node_label[gi, 1] == 1
        # label multiset preserved by the slot permutation
        assert (sorted(dense.node_label[gi, :nn].tolist())
                == sorted(g.node_label.tolist()))
        # every edge connects a user-labeled row to an item-labeled row
        lab = dense.node_label[gi]
        assert (lab[dense.edge_src[gi, :ne]] % 2 == 0).all()
        assert (lab[dense.edge_dst[gi, :ne]] % 2 == 1).all()
    assert not dense.graph_mask[len(graphs):].any()


@pytest.mark.parametrize("aggr", ["mean", "sum", "relmean"])
def test_dense_forward_matches_flat(aggr):
    rng = np.random.default_rng(1)
    _, flat, dense = make_pair(rng, n_graphs=7)
    cfg = IGMCConfig(num_relations=5, num_bases=4, aggr=aggr, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    out_flat = igmc_forward(params, flat, cfg, training=False)
    out_dense = igmc_forward(params, dense, cfg, training=False)
    B = len(_)
    np.testing.assert_allclose(np.asarray(out_flat)[:B],
                               np.asarray(out_dense)[:B],
                               rtol=2e-5, atol=2e-5)


def test_dense_forward_many_relations():
    """R=71 (yahoo_music shape) through the dense path."""
    rng = np.random.default_rng(2)
    graphs, flat, dense = make_pair(rng, num_relations=71)
    cfg = IGMCConfig(num_relations=71, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(1), cfg)
    B = len(graphs)  # padded graph slots legitimately differ between layouts
    np.testing.assert_allclose(
        np.asarray(igmc_forward(params, flat, cfg, training=False))[:B],
        np.asarray(igmc_forward(params, dense, cfg, training=False))[:B],
        rtol=2e-5, atol=2e-5)


def test_dense_side_features():
    rng = np.random.default_rng(3)
    graphs, flat, dense = make_pair(rng, side=6)
    cfg = IGMCConfig(num_relations=5, side_features=True, n_side_features=12,
                     adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(2), cfg)
    B = len(graphs)
    np.testing.assert_allclose(
        np.asarray(igmc_forward(params, flat, cfg, training=False))[:B],
        np.asarray(igmc_forward(params, dense, cfg, training=False))[:B],
        rtol=2e-5, atol=2e-5)


def test_dense_grads_match_flat():
    rng = np.random.default_rng(4)
    _, flat, dense = make_pair(rng)
    cfg = IGMCConfig(num_relations=5, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(3), cfg)

    def loss(p, b):
        preds = igmc_forward(p, b, cfg, training=False)
        g = b.graph_mask.astype(jnp.float32)
        return jnp.sum(((preds - b.y) ** 2) * g) / jnp.maximum(g.sum(), 1.0)

    gf = jax.grad(loss)(params, flat)
    gd = jax.grad(loss)(params, dense)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_dense_bf16_close_to_f32():
    rng = np.random.default_rng(5)
    _, _, dense = make_pair(rng)
    cfg32 = IGMCConfig(num_relations=5, adj_dropout=0.0)
    cfg16 = IGMCConfig(num_relations=5, adj_dropout=0.0,
                       compute_dtype="bfloat16")
    params = igmc_init(jax.random.PRNGKey(4), cfg32)
    o32 = np.asarray(igmc_forward(params, dense, cfg32, training=False))
    o16 = np.asarray(igmc_forward(params, dense, cfg16, training=False))
    np.testing.assert_allclose(o32, o16, rtol=0.05, atol=0.05)


def test_dense_dropout_force_undirected_ties_directions():
    from igmc_tpu.ops.dropout import edge_dropout_dense

    mask = jnp.ones((4, 64), dtype=bool)
    mf, mr = edge_dropout_dense(jax.random.PRNGKey(0), mask, 0.5, True)
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(mr))
    rate = 1.0 - np.asarray(mf).mean()
    assert 0.3 < rate < 0.7
    mf2, mr2 = edge_dropout_dense(jax.random.PRNGKey(0), mask, 0.5, False)
    assert (np.asarray(mf2) != np.asarray(mr2)).any()
    # eval / p=0: no-op
    mf3, mr3 = edge_dropout_dense(jax.random.PRNGKey(0), mask, 0.5, True,
                                  training=False)
    assert np.asarray(mf3).all() and np.asarray(mr3).all()


def test_dense_dropout_trains():
    """Training mode with adj_dropout runs and stays finite (both
    force_undirected settings) — dropout is fully supported on the dense
    path, unlike the Pallas-aligned one."""
    rng = np.random.default_rng(6)
    _, _, dense = make_pair(rng)
    for fu in (False, True):
        cfg = IGMCConfig(num_relations=5, adj_dropout=0.3,
                         force_undirected=fu)
        params = igmc_init(jax.random.PRNGKey(5), cfg)
        out = igmc_forward(params, dense, cfg, key=jax.random.PRNGKey(9),
                           training=True)
        assert np.isfinite(np.asarray(out)).all()


def test_plan_dense_buckets_partitions_and_fits():
    rng = np.random.default_rng(7)
    nc = rng.pareto(2.0, size=500) * 30 + 2
    ec = nc * rng.uniform(0.5, 3.0, size=500)
    nc, ec = nc.astype(np.int64), ec.astype(np.int64)
    buckets = plan_dense_buckets(nc, ec, max_buckets=3)
    assert 1 <= len(buckets) <= 3
    seen = np.concatenate([b.indices for b in buckets])
    assert sorted(seen.tolist()) == list(range(500))
    for b in buckets:
        assert (nc[b.indices] <= b.node_slot).all()
        assert (ec[b.indices] <= b.edge_slot).all()
        assert b.node_slot % 8 == 0 and b.edge_slot % 8 == 0
    # bucketing should beat one-size-fits-all on padded node-area
    one = max(nc) * len(nc)
    bucketed = sum(b.node_slot * len(b.indices) for b in buckets)
    assert bucketed < one


@pytest.mark.slow
def test_dense_train_end_to_end_golden():
    """batch_mode='dense' through train_multiple_epochs (device-resident
    per-bucket scan steps): pinned to a golden RMSE so numerics regressions
    in the dense assemble/aggregate path move this test."""
    from test_regression import _toy_dataset
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
        progress=False, superbatch=4, batch_mode="dense")
    # Re-pinned when plan_dense_buckets switched to cost-minimizing DP
    # splits (changes bucket membership and hence the epoch's unit
    # permutation and dropout key indices, i.e. training order — not the
    # math; the dense vs flat step-parity tests pin the math).
    assert rmse == pytest.approx(1.6545770, abs=1e-3), rmse


def test_dense_test_once_matches_train_eval():
    """test_once(batch_mode='dense') reproduces the in-training dense eval
    for the same params (exercises assemble_dense + dense eval + the
    ensemble machinery's predict path)."""
    from test_regression import _toy_dataset
    from igmc_tpu.train import test_once
    from igmc_tpu.train.loop import (
        dense_device_eval_rmse, make_dense_device_eval_step, dense_predict_all)
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.batching.dense import plan_dense_buckets

    test_ds, _ = _toy_dataset(seed=6, n_links=32)
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(2), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    rmse_dense = test_once(test_ds, fwd, params, batch_size=16,
                           batch_mode="dense")
    rmse_flat = test_once(test_ds, fwd, params, batch_size=16,
                          batch_mode="flat")
    assert rmse_dense == pytest.approx(rmse_flat, abs=1e-4)
    # prediction scatter covers every graph exactly once
    dd = DeviceDataset(test_ds.packed, 8, 16, 16)
    buckets = plan_dense_buckets(test_ds.node_counts(),
                                 test_ds.edge_counts() // 2)
    fns = [make_dense_device_eval_step(fwd, b.node_slot, b.edge_slot)
           for b in buckets]
    preds = dense_predict_all(fns, params, dd, buckets, 16, len(test_ds))
    assert np.isfinite(preds).all()
    rmse_scatter = float(np.sqrt(np.mean(
        (preds - np.asarray(test_ds.packed.y)) ** 2)))
    assert rmse_scatter == pytest.approx(rmse_flat, abs=1e-4)


def test_dense_batch_is_pytree():
    rng = np.random.default_rng(8)
    _, _, dense = make_pair(rng)
    leaves, treedef = jax.tree_util.tree_flatten(dense)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, DenseBatch)
    stacked = jax.tree_util.tree_map(lambda a: np.stack([a, a]), dense)
    assert stacked.node_label.ndim == 3


def test_dense_dp_step_matches_single_device():
    """make_dense_device_train_step(mesh=8-cpu) — packed tables replicated,
    gid-block graph axis sharded over 'data' — produces the same params,
    loss, and count as the meshless step, including a half-full (-1-padded)
    block. The only collective is the GSPMD gradient psum, so agreement
    here is the DP-correctness proof for the flagship dense path."""
    from test_regression import _toy_dataset
    from igmc_tpu.batching.dense import plan_dense_buckets
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.parallel import make_mesh, replicated_sharding
    from igmc_tpu.train.loop import (make_dense_device_train_step,
                                     make_dense_device_eval_step,
                                     make_optimizer)

    train_ds, _ = _toy_dataset(seed=7, n_links=48)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-2)
    bucket = plan_dense_buckets(train_ds.node_counts(),
                                train_ds.edge_counts() // 2,
                                max_buckets=1)[0]
    B = 16
    blk = np.full((2, B), -1, np.int32)              # K=2 superbatch
    blk[0, : B - 3] = np.arange(B - 3)               # half-full block
    blk[1, :B] = np.arange(B, 2 * B)

    mesh = make_mesh(n_data=8)
    pshd = replicated_sharding(mesh)
    results = {}
    for tag, m, shd in (("single", None, None), ("dp", mesh, pshd)):
        dd = DeviceDataset(train_ds.packed, 8, 16, B, sharding=shd)
        step = make_dense_device_train_step(
            fwd, opt, bucket.node_slot, bucket.edge_slot, ARR=0.001, mesh=m)
        p = igmc_init(jax.random.PRNGKey(3), cfg)
        s = opt.init(p)
        if m is not None:
            p, s = jax.device_put(p, pshd), jax.device_put(s, pshd)
        p, s, loss, n = step(p, s, np.zeros((), np.float32), dd,
                             jnp.asarray(blk), jax.random.PRNGKey(4),
                             jnp.int32(0))
        ev = make_dense_device_eval_step(fwd, bucket.node_slot,
                                         bucket.edge_slot, mesh=m)
        zero = (np.zeros((), np.float32), np.zeros((), np.float32))
        (sse, cnt), _ = ev(p, zero, dd, jnp.asarray(blk))
        results[tag] = (jax.device_get(p), float(loss), float(n),
                        float(sse), float(cnt))

    p1, l1, n1, sse1, c1 = results["single"]
    p2, l2, n2, sse2, c2 = results["dp"]
    assert n1 == n2 == (B - 3) + B and c1 == c2
    assert l1 == pytest.approx(l2, rel=1e-5)
    assert sse1 == pytest.approx(sse2, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        # GSPMD partitioning reassociates reductions, so single vs DP
        # gradients differ by ULPs — and one Adam step amplifies that
        # relatively without bound where grad ~ 0 (update = lr*m/rsqrt(v),
        # both tiny). Absolute closeness is the meaningful criterion here
        # (Adam bounds one step's |update| by ~lr); loss/sse/n above match
        # to 1e-5.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)


@pytest.mark.slow
def test_dense_dp_train_end_to_end_matches_single():
    """train_multiple_epochs(batch_mode='dense', mesh=8-cpu): the full DP
    training run reproduces the single-device dense run's final RMSE (same
    seed => same shuffles, same dropout keys; sharding must not change the
    math)."""
    from test_regression import _toy_dataset
    from igmc_tpu.parallel import make_mesh
    from igmc_tpu.train import train_multiple_epochs

    train_ds, _ = _toy_dataset(seed=5, n_links=64)
    test_ds, _ = _toy_dataset(seed=6, n_links=32)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)

    kw = dict(epochs=4, batch_size=16, lr=1e-2, lr_decay_factor=0.1,
              lr_decay_step_size=20, ARR=0.001, test_freq=2, seed=11,
              progress=False, superbatch=2, batch_mode="dense")
    rmse_single, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg), **kw)
    rmse_dp, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg),
        mesh=make_mesh(n_data=8), **kw)
    assert rmse_dp == pytest.approx(rmse_single, abs=1e-4)


@pytest.mark.slow
def test_dense_adjacency_strategy_matches_edge():
    """rgcn dense 'adjacency' strategy (per-relation [B,R,n,n] built once
    per forward) vs the 'edge' per-edge one-hot formulation: identical
    forward and gradients for mean and sum, with and without (untied)
    edge dropout; 'auto' falls back to edge when the adjacency would
    exceed dense_adj_max_bytes."""
    rng = np.random.default_rng(21)
    _, _, dense = make_pair(rng, n_graphs=5)

    for aggr in ("mean", "sum"):
        cfgs = [IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                           aggr=aggr, dense_strategy=s)
                for s in ("edge", "adjacency")]
        params = igmc_init(jax.random.PRNGKey(0), cfgs[0])
        oe = igmc_forward(params, dense, cfgs[0], key=None, training=False)
        oa = igmc_forward(params, dense, cfgs[1], key=None, training=False)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(oe),
                                   rtol=1e-5, atol=1e-5)
        ge, ga = [
            jax.grad(lambda p: jnp.sum(
                igmc_forward(p, dense, c, key=None, training=False) ** 2))(
                    params)
            for c in cfgs
        ]
        for a, b in zip(jax.tree_util.tree_leaves(ge),
                        jax.tree_util.tree_leaves(ga)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    # training with UNTIED per-direction dropout masks (adj_r path): same
    # key => same masks => the strategies must still agree exactly
    for fu in (False, True):
        cfg_e, cfg_a = [
            IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.4,
                       force_undirected=fu, dense_strategy=s)
            for s in ("edge", "adjacency")
        ]
        params = igmc_init(jax.random.PRNGKey(1), cfg_e)
        k = jax.random.PRNGKey(7)
        oe = igmc_forward(params, dense, cfg_e, key=k, training=True)
        oa = igmc_forward(params, dense, cfg_a, key=k, training=True)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(oe),
                                   rtol=1e-5, atol=1e-5)

    # auto memory gate: a 1-byte cap must fall back to the edge path (and
    # still be correct); relmean never takes the adjacency path
    cfg_gate = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                          dense_strategy="auto", dense_adj_max_bytes=1)
    cfg_edge = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                          dense_strategy="edge")
    params = igmc_init(jax.random.PRNGKey(2), cfg_gate)
    np.testing.assert_allclose(
        np.asarray(igmc_forward(params, dense, cfg_gate, key=None)),
        np.asarray(igmc_forward(params, dense, cfg_edge, key=None)),
        rtol=1e-6)
    cfg_rm = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                        aggr="relmean", dense_strategy="auto")
    out = igmc_forward(params, dense, cfg_rm, key=None)  # edge fallback
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("model", ["gnn", "dgcnn", "dgcnn_rs"])
def test_dense_alternate_models_match_flat(model):
    """GNN / DGCNN / DGCNN_RS on the dense-blocked layout match the flat
    segment path on identical graphs (round-2 VERDICT item 7: the
    alternate-model family no longer rides the 19-24x slower flat path)."""
    from igmc_tpu.models import (DGCNNConfig, GNNConfig, dgcnn_forward,
                                 dgcnn_init, gnn_forward, gnn_init)

    rng = np.random.default_rng(3)
    _, flat, dense = make_pair(rng, n_graphs=7)
    if model == "gnn":
        cfg = GNNConfig(adj_dropout=0.0)
        params = gnn_init(jax.random.PRNGKey(0), cfg)
        out_flat = gnn_forward(params, flat, cfg, training=False)
        out_dense = gnn_forward(params, dense, cfg, training=False)
    else:
        cfg = DGCNNConfig(adj_dropout=0.0, k=10,
                          relational=(model == "dgcnn_rs"))
        params = dgcnn_init(jax.random.PRNGKey(0), cfg)
        out_flat = dgcnn_forward(params, flat, cfg, training=False)
        out_dense = dgcnn_forward(params, dense, cfg, training=False)
    B = 7
    np.testing.assert_allclose(np.asarray(out_flat)[:B],
                               np.asarray(out_dense)[:B],
                               rtol=2e-4, atol=2e-4)


def test_dense_sort_pool_k_exceeds_slot():
    """k larger than the node slot: tail rows must be zero-padded."""
    from igmc_tpu.ops.sort_pool import dense_sort_pool

    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 4, 2)),
                    jnp.float32)
    mask = jnp.ones((3, 4), bool)
    out = dense_sort_pool(x, mask, k=6)
    assert out.shape == (3, 12)
    assert np.all(np.asarray(out)[:, 8:] == 0.0)


def test_dense_dgcnn_trains():
    """Dense DGCNN_RS end-to-end training step decreases loss (the dense
    device-resident loop is model-agnostic; this guards the trunk+pool
    backward)."""
    from igmc_tpu.models import DGCNNConfig, dgcnn_forward, dgcnn_init
    from igmc_tpu.train.loop import make_optimizer, make_train_step

    rng = np.random.default_rng(4)
    _, _, dense = make_pair(rng, n_graphs=8)
    cfg = DGCNNConfig(adj_dropout=0.2, k=10, relational=True)
    params = dgcnn_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: dgcnn_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-2)
    step = make_train_step(fwd, opt, ARR=0.0, with_arr_params=False)
    s = opt.init(params)
    dense = jax.device_put(dense)
    losses = []
    for i in range(8):
        params, s, loss, _ = step(params, s, dense, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_chunked_dense_forward_matches_monolithic():
    """igmc_forward_dense_chunked (the HBM-resident giant-batch streaming
    formulation) is the SAME function as the monolithic dense forward —
    equality to float tolerance with dropout off (bitwise on a single
    device; the virtual 8-device CPU backend changes XLA's intra-op
    thread partitioning between the two compilations, so reductions
    reassociate)."""
    from __graft_entry__ import _synthetic_dense_batch
    from igmc_tpu.models import igmc_forward_dense_chunked

    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    batch = _synthetic_dense_batch(num_graphs=48, node_slot=16,
                                   edge_slot=32, num_relations=5)
    full = igmc_forward(params, batch, cfg)
    for chunk in (12, 48):
        chunked = igmc_forward_dense_chunked(params, batch, cfg, chunk)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   rtol=5e-3, atol=5e-4)
    with pytest.raises(ValueError):
        igmc_forward_dense_chunked(params, batch, cfg, 13)


def test_chunked_dense_train_step_matches_unchunked():
    """The remat'd gradient-accumulating chunked train step produces the
    same parameters as make_train_step on the same giant batch when the
    forward is deterministic (training randomness off — the production
    step differs only in per-chunk dropout stream assignment, documented
    in make_chunked_dense_train_step)."""
    from __graft_entry__ import _synthetic_dense_batch
    from igmc_tpu.train.loop import (make_chunked_dense_train_step,
                                     make_optimizer, make_train_step)

    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    batch = _synthetic_dense_batch(num_graphs=32, node_slot=16,
                                   edge_slot=32, num_relations=5)
    # deterministic forward: ignore the training flag entirely
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, None, False)
    opt = make_optimizer(1e-3)
    key = jax.random.PRNGKey(7)
    copy = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.array(np.asarray(a)), t)
    ref_step = make_train_step(fwd, opt, ARR=0.001)
    p1, s1, l1, n1 = ref_step(copy(params), opt.init(copy(params)),
                              batch, key)
    chk_step = make_chunked_dense_train_step(fwd, opt, chunk=8, ARR=0.001)
    p2, s2, l2, n2 = chk_step(copy(params), opt.init(copy(params)),
                              batch, key)
    assert float(n1) == float(n2)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_chunked_dense_device_step_matches_unchunked():
    """make_chunked_dense_device_train_step (device-resident giant-batch
    gradient accumulation, the --dense-chunk CLI path) produces the same
    params / loss sum / count as make_dense_device_train_step on the same
    [K, B] gid block when the forward is deterministic — including a
    half-full row and an all-(-1) padding row."""
    from test_regression import _toy_dataset
    from igmc_tpu.batching.dense import plan_dense_buckets
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.train.loop import (make_chunked_dense_device_train_step,
                                     make_dense_device_train_step,
                                     make_optimizer)

    train_ds, _ = _toy_dataset(seed=9, n_links=48)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, None, False)
    opt = make_optimizer(1e-2)
    bucket = plan_dense_buckets(train_ds.node_counts(),
                                train_ds.edge_counts() // 2,
                                max_buckets=1)[0]
    B = 16
    blk = np.full((3, B), -1, np.int32)
    blk[0, : B - 5] = np.arange(B - 5)               # half-full row
    blk[1, :B] = np.arange(B, 2 * B)                 # row 2 stays all -1
    dd = DeviceDataset(train_ds.packed, 8, 16, B)
    results = {}
    for tag, step in (
        ("mono", make_dense_device_train_step(
            fwd, opt, bucket.node_slot, bucket.edge_slot, ARR=0.001)),
        ("chunk", make_chunked_dense_device_train_step(
            fwd, opt, bucket.node_slot, bucket.edge_slot, chunk=4,
            ARR=0.001)),
    ):
        p = igmc_init(jax.random.PRNGKey(3), cfg)
        p, s, loss_sum, n = step(p, opt.init(p), np.zeros((), np.float32),
                                 dd, jnp.asarray(blk), jax.random.PRNGKey(4),
                                 jnp.int32(0))
        results[tag] = (jax.device_get(p), float(loss_sum), float(n))
    p1, l1, n1 = results["mono"]
    p2, l2, n2 = results["chunk"]
    assert n1 == n2 == (B - 5) + B
    assert l1 == pytest.approx(l2, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)


@pytest.mark.slow
def test_train_multiple_epochs_dense_chunk_matches_unchunked():
    """train_multiple_epochs(dense_chunk=...) — the --dense-chunk giant-
    batch CLI path — reproduces the unchunked dense run's final RMSE with a
    deterministic forward (with any dropout — adjacency or the MLP head's —
    the chunked step's per-slice key streams differ by design)."""
    from test_regression import _toy_dataset
    from igmc_tpu.train import train_multiple_epochs

    train_ds, _ = _toy_dataset(seed=5, n_links=64)
    test_ds, _ = _toy_dataset(seed=6, n_links=32)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, None, False)

    kw = dict(epochs=3, batch_size=32, lr=1e-2, lr_decay_factor=0.1,
              lr_decay_step_size=20, ARR=0.001, test_freq=1, seed=11,
              progress=False, superbatch=2, batch_mode="dense")
    rmse_mono, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg), **kw)
    rmse_chunk, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg),
        dense_chunk=8, **kw)
    assert rmse_chunk == pytest.approx(rmse_mono, abs=2e-4)

    with pytest.raises(ValueError):  # chunk must divide the batch
        train_multiple_epochs(
            train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg),
            dense_chunk=7, **kw)


def test_chunked_dense_train_decreases_loss():
    """End-to-end: the production chunked step (dropout ON) trains."""
    from __graft_entry__ import _synthetic_dense_batch
    from igmc_tpu.train.loop import (make_chunked_dense_train_step,
                                     make_optimizer)

    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    batch = _synthetic_dense_batch(num_graphs=32, node_slot=16,
                                   edge_slot=32, num_relations=5)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-2)
    step = make_chunked_dense_train_step(fwd, opt, chunk=8, ARR=0.001)
    p, s = params, opt.init(params)
    losses = []
    for i in range(12):
        p, s, loss, _ = step(p, s, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dynamic_dense_dp_train_matches_single_device():
    """Dynamic datasets on the dense layout train DATA-PARALLEL: the
    host-collated DenseBatch's graph axis is sharded over 'data' (every
    leaf leads with it) and the plain jitted steps run under GSPMD, which
    inserts the gradient psum — no sub-batch stacking, no packed tables.
    Full-run parity with the single-device dynamic-dense run (same seed =>
    same shuffle orders and dropout keys; sharding must not change the
    math), superbatch scan stacks included."""
    import scipy.sparse as sp

    from test_regression import _toy_matrix
    from igmc_tpu.batching import DynamicGraphDataset
    from igmc_tpu.parallel import make_mesh
    from igmc_tpu.train import train_multiple_epochs

    def dyn(seed, n_links):
        M = _toy_matrix(seed)
        A = sp.csr_matrix(M)
        us, vs = np.nonzero(M)
        labels = (M[us, vs] - 1).astype(np.int64)
        return DynamicGraphDataset(
            None, A, (us[:n_links], vs[:n_links]), labels[:n_links], h=1,
            class_values=np.arange(1.0, 6.0), backend="numpy")

    train_ds, test_ds = dyn(5, 64), dyn(6, 32)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    kw = dict(epochs=3, batch_size=16, lr=1e-2, lr_decay_factor=0.1,
              lr_decay_step_size=20, ARR=0.001, test_freq=1, seed=11,
              progress=False, superbatch=2, batch_mode="dense")
    rmse_single, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg), **kw)
    rmse_dp, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg),
        mesh=make_mesh(n_data=8), **kw)
    assert rmse_dp == pytest.approx(rmse_single, abs=1e-4)

    with pytest.raises(ValueError):  # batch must split evenly over the mesh
        train_multiple_epochs(
            train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg),
            mesh=make_mesh(n_data=8), **{**kw, "batch_size": 12})


def test_dynamic_dense_loader_matches_flat_eval():
    """batch_mode='dense' on a DYNAMIC dataset (round 4): host-collated
    dense batches give the same eval RMSE and raw predictions as the flat
    loader, and the superbatch stacking path works."""
    import jax

    from igmc_tpu.batching import DynamicGraphDataset
    from igmc_tpu.batching.dataset import BatchLoader
    from igmc_tpu.data import load_data_monti
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.train.loop import eval_rmse, make_eval_step

    split = load_data_monti("flixster", testing=True)
    n = 120
    ds = DynamicGraphDataset(None, split.adj_train,
                             (split.test_u_indices[:n],
                              split.test_v_indices[:n]),
                             split.test_labels[:n], h=1,
                             class_values=split.class_values)
    cfg = IGMCConfig(num_relations=len(split.class_values), num_bases=4)
    params = igmc_init(jax.random.PRNGKey(2), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    eval_fn = make_eval_step(fwd)

    flat = BatchLoader(ds, 40, shuffle=False, superbatch=0)
    rmse_flat = eval_rmse(eval_fn, params, flat)
    dense = BatchLoader(ds, 40, shuffle=False, superbatch=0,
                        batch_mode="dense")
    rmse_dense = eval_rmse(eval_fn, params, dense)
    np.testing.assert_allclose(rmse_dense, rmse_flat, rtol=1e-5)

    dense_sb = BatchLoader(ds, 40, shuffle=False, superbatch=3,
                           batch_mode="dense")
    batches = list(dense_sb)
    assert any(getattr(b, "stacked", None) == "superbatch" for b in batches)
    rmse_sb = eval_rmse(eval_fn, params, dense_sb)
    np.testing.assert_allclose(rmse_sb, rmse_flat, rtol=1e-5)


def test_dense_edge_k_strategy_matches_edge():
    """dense_strategy='edge-k' (per-basis fused scatters, no [B,E,nb*C]
    outer product) is numerically identical to the default edge path.
    Measured SLOWER on v5e at the n=64 headline shape (0.113 vs 0.092 ms,
    2026-08-20: the per-k N=32 dots underfill the 128-wide MXU tile), so
    it stays an explicitly selectable strategy, not a default."""
    rng = np.random.default_rng(21)
    _, _, dense = make_pair(rng)
    params = igmc_init(jax.random.PRNGKey(31),
                       IGMCConfig(num_features=8, num_relations=5))
    outs = []
    for strat in ("edge", "edge-k"):
        cfg = IGMCConfig(num_features=8, num_relations=5, adj_dropout=0.0,
                         dense_strategy=strat)
        outs.append(igmc_forward(params, dense, cfg))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
