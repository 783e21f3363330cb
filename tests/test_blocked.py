"""ops/blocked.py oracle tests: the scatter-free blocked aggregate must
match the flat segment formulation (forward AND gradients) exactly."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from igmc_tpu.models.rgcn import rgcn_init
from igmc_tpu.ops.blocked import (BlockedEdges, blocked_degree,
                                  blocked_rgcn_aggregate, dropout_masks,
                                  plan_blocked_edges)


def _rand_edges(N=512, E=4096, R=5, seed=0, fill=0.9):
    rng = np.random.default_rng(seed)
    ne = int(E * fill) // 2
    # UNIQUE undirected pairs (duplicate pairs would alias in the
    # dropout-consistency test), random orientation
    idx = rng.choice(N * N, size=3 * ne, replace=False)
    a, b = (idx // N).astype(np.int32), (idx % N).astype(np.int32)
    keep = a < b
    a, b = a[keep][:ne], b[keep][:ne]
    assert len(a) == ne
    flip = rng.random(ne) < 0.5
    src = np.where(flip, b, a).astype(np.int32)
    dst = np.where(flip, a, b).astype(np.int32)
    et = rng.integers(0, R, ne).astype(np.int32)
    # both directions, reference collate layout
    edge_src = np.zeros(E, np.int32)
    edge_dst = np.zeros(E, np.int32)
    edge_type = np.zeros(E, np.int32)
    edge_canon = np.arange(E, dtype=np.int32)
    edge_mask = np.zeros(E, bool)
    edge_src[:ne], edge_dst[:ne], edge_type[:ne] = src, dst, et
    edge_src[ne:2 * ne], edge_dst[ne:2 * ne] = dst, src
    edge_type[ne:2 * ne] = et
    edge_canon[ne:2 * ne] = np.arange(ne, dtype=np.int32)
    edge_mask[:2 * ne] = True
    return edge_src, edge_dst, edge_type, edge_canon, edge_mask


def _oracle(x, att, basis, src, dst, et, em, N):
    nb, cin, cout = basis.shape
    xs = x[src]
    ae = att[et] * em.astype(x.dtype)[:, None]
    z = (ae[:, :, None] * xs[:, None, :]).reshape(-1, nb * cin)
    msg = z @ basis.reshape(nb * cin, cout)
    return jax.ops.segment_sum(msg, dst, num_segments=N)


def test_blocked_forward_matches_segment_oracle():
    N, E, R, C = 512, 4096, 5, 16
    es, ed, et, ec, em = _rand_edges(N, E, R)
    p = rgcn_init(jax.random.PRNGKey(0), C, C, R, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, C))
    blocked = plan_blocked_edges(es, ed, et, em, ec, N, rows=128, eblk=256,
                                 group=4)
    out = blocked_rgcn_aggregate(
        x, p["att"], p["basis"], blocked,
        (blocked.fwd.mask, blocked.bwd.mask), blocked.rows, N, 4)
    ref = _oracle(x, p["att"], p["basis"], es, ed, et, em, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_blocked_gradients_match_segment_oracle():
    N, E, R, C = 256, 2048, 5, 8
    es, ed, et, ec, em = _rand_edges(N, E, R, seed=3)
    p = rgcn_init(jax.random.PRNGKey(0), C, C, R, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, C))
    blocked = plan_blocked_edges(es, ed, et, em, ec, N, rows=64, eblk=256,
                                 group=4)
    masks = (blocked.fwd.mask, blocked.bwd.mask)

    def loss_blocked(x, att, basis):
        out = blocked_rgcn_aggregate(x, att, basis, blocked, masks,
                                     blocked.rows, N, 4)
        return jnp.sum(jnp.sin(out))

    def loss_ref(x, att, basis):
        return jnp.sum(jnp.sin(_oracle(x, att, basis, es, ed, et, em, N)))

    g1 = jax.grad(loss_blocked, argnums=(0, 1, 2))(x, p["att"], p["basis"])
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, p["att"], p["basis"])
    for a, b, name in zip(g1, g2, ("dx", "datt", "dbasis")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_blocked_degree_matches_bincount():
    N, E = 256, 2048
    es, ed, et, ec, em = _rand_edges(N, E, seed=5)
    blocked = plan_blocked_edges(es, ed, et, em, ec, N, rows=64, eblk=256,
                                 group=4)
    deg = blocked_degree(blocked.fwd, blocked.fwd.mask, blocked.rows, N)
    ref = np.bincount(ed[em], minlength=N).astype(np.float32)
    np.testing.assert_allclose(np.asarray(deg), ref, rtol=1e-6, atol=1e-6)


def test_dropout_masks_consistent_between_plans():
    """Each DIRECTED edge must get the same keep decision in the fwd and
    bwd plans; force_undirected additionally ties the two directions."""
    N, E = 256, 2048
    es, ed, et, ec, em = _rand_edges(N, E, seed=7)
    blocked = plan_blocked_edges(es, ed, et, em, ec, N, rows=64, eblk=256,
                                 group=4)

    def edge_decisions(plan, mask, rows):
        # map (gather_global, row_global) -> keep
        rg = np.asarray(plan.row) + np.asarray(plan.chunk)[:, None] * rows
        out = {}
        m0 = np.asarray(plan.mask) > 0
        mk = np.asarray(mask)
        g = np.asarray(plan.gather)
        for b, e in zip(*np.nonzero(m0)):
            out[(int(g[b, e]), int(rg[b, e]))] = bool(mk[b, e] > 0)
        return out

    for fu in (True, False):
        mf, mb = dropout_masks(blocked, 0.5, fu, jnp.uint32(3))
        dec_f = edge_decisions(blocked.fwd, mf, blocked.rows)
        dec_b = edge_decisions(blocked.bwd, mb, blocked.rows)
        # bwd plan swaps (gather, row): the same directed edge u->v appears
        # as (u, v) in fwd (gather=src, row=dst) and (v, u) in bwd
        assert len(dec_f) == len(dec_b)
        for (u, v), keep in dec_f.items():
            assert dec_b[(v, u)] == keep, "fwd/bwd dropout desync"
        if fu:
            # both directions tied
            for (u, v), keep in dec_f.items():
                assert dec_f.get((v, u), keep) == keep
        else:
            ties = [dec_f[(u, v)] == dec_f[(v, u)]
                    for (u, v) in dec_f if (v, u) in dec_f]
            assert ties and not all(ties), "directions must be independent"


def test_blocked_skewed_degrees():
    """Power-law dst distribution: heavy rows span several blocks of one
    chunk; forward must still match the oracle."""
    N, R, C = 256, 5, 8
    rng = np.random.default_rng(11)
    ne = 3000
    # half the edges hit 4 hub nodes
    dst = np.where(rng.random(ne) < 0.5, rng.integers(0, 4, ne),
                   rng.integers(0, N, ne)).astype(np.int32)
    src = rng.integers(0, N, ne).astype(np.int32)
    et = rng.integers(0, R, ne).astype(np.int32)
    E = 4096
    es = np.zeros(E, np.int32); ed = np.zeros(E, np.int32)
    ety = np.zeros(E, np.int32); ec = np.arange(E, dtype=np.int32)
    em = np.zeros(E, bool)
    es[:ne], ed[:ne], ety[:ne], em[:ne] = src, dst, et, True
    p = rgcn_init(jax.random.PRNGKey(0), C, C, R, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, C))
    blocked = plan_blocked_edges(es, ed, ety, em, ec, N, rows=64, eblk=256,
                                 group=4)
    out = blocked_rgcn_aggregate(
        x, p["att"], p["basis"], blocked,
        (blocked.fwd.mask, blocked.bwd.mask), blocked.rows, N, 4)
    ref = _oracle(x, p["att"], p["basis"], es, ed, ety, em, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def _collated_batch(n_graphs=12, node_pad=320, edge_pad=2048, seed=0):
    import scipy.sparse as sp

    from igmc_tpu.batching import collate
    from igmc_tpu.graphs import BipartiteCSR, extract_many

    rng = np.random.default_rng(seed)
    M = (rng.random((40, 40)) < 0.3).astype(np.float32) * rng.integers(
        1, 6, (40, 40)).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    graphs = extract_many((us[:n_graphs], vs[:n_graphs]), labels[:n_graphs],
                          A, h=1, class_values=cv, backend="numpy")
    return collate(graphs, n_graphs, node_pad, edge_pad)


@pytest.mark.slow
def test_igmc_forward_blocked_matches_segment():
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init

    batch = _collated_batch()
    batch.blocked = plan_blocked_edges(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.edge_canon, batch.num_nodes, rows=64, eblk=256, group=4)
    for aggr in ("mean", "sum"):
        cfg_seg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                             aggr=aggr)
        cfg_blk = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                             aggr=aggr, flat_aggregate="blocked")
        params = igmc_init(jax.random.PRNGKey(0), cfg_seg)
        ref = igmc_forward(params, batch, cfg_seg, None, False)
        out = igmc_forward(params, batch, cfg_blk, None, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=aggr)


def test_igmc_blocked_trains_with_adj_dropout():
    """The blocked path must TRAIN (custom_vjp backward) with edge dropout
    live — the capability the pallas path lacks."""
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.train.loop import make_optimizer, make_train_step

    batch = _collated_batch(seed=4)
    batch.blocked = plan_blocked_edges(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.edge_canon, batch.num_nodes, rows=64, eblk=256, group=4)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2,
                     flat_aggregate="blocked")
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-2)
    step = make_train_step(fwd, opt, ARR=0.001)
    s = opt.init(params)
    batch = jax.device_put(batch)
    losses = []
    for i in range(6):
        params, s, loss, _ = step(params, s, batch,
                                  jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_loader_attaches_blocked_plans_end_to_end():
    """BatchLoader(flat_aggregate='blocked') + train_multiple_epochs: the
    full flat pipeline runs on the blocked engine and learns."""
    import scipy.sparse as sp

    from igmc_tpu.batching import BatchLoader, StaticGraphDataset
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.train import train_multiple_epochs

    rng = np.random.default_rng(0)
    M = (rng.random((30, 30)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (30, 30)).astype(np.float32)
    Ms = sp.csr_matrix(M)
    us, vs = Ms.nonzero()
    labels = (np.asarray(Ms[us, vs]).ravel() - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    ds = StaticGraphDataset(None, Ms, (us[:40], vs[:40]), labels[:40], h=1,
                            class_values=cv)
    loader = BatchLoader(ds, 16, flat_aggregate="blocked", plan_rows=64,
                         plan_eblk=256)
    batches = list(loader)
    assert all(b.blocked is not None for b in batches)
    shapes = {b.blocked.fwd.gather.shape for b in batches
              if b.num_nodes == batches[0].num_nodes}
    assert len(shapes) == 1, "one plan shape per bucket"

    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2,
                     flat_aggregate="blocked")
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    rmse, _ = train_multiple_epochs(
        ds, ds, fwd, params, epochs=3, batch_size=16, lr=1e-2,
        lr_decay_factor=0.1, lr_decay_step_size=50, ARR=0.001,
        test_freq=1, seed=1, progress=False, flat_aggregate="blocked")
    assert np.isfinite(rmse)


def test_loader_pallas_eval_parity_interpret():
    """flat_aggregate='pallas': the loader attaches block-aligned edges and
    eval through make_eval_step matches the segment path (interpreter mode
    on CPU; the same wiring feeds the real kernel on TPU)."""
    import scipy.sparse as sp

    from igmc_tpu.batching import BatchLoader, StaticGraphDataset
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.train.loop import eval_rmse, make_eval_step

    rng = np.random.default_rng(2)
    M = (rng.random((30, 30)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (30, 30)).astype(np.float32)
    Ms = sp.csr_matrix(M)
    us, vs = Ms.nonzero()
    labels = (np.asarray(Ms[us, vs]).ravel() - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    ds = StaticGraphDataset(None, Ms, (us[:32], vs[:32]), labels[:32], h=1,
                            class_values=cv)

    cfg_p = IGMCConfig(num_relations=5, num_bases=4, use_pallas=True,
                       pallas_rows=64, pallas_interpret=True)
    cfg_s = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(0), cfg_s)

    fwd_p = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg_p, key, training)
    fwd_s = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg_s, key, training)
    loader_p = BatchLoader(ds, 16, flat_aggregate="pallas", plan_rows=64,
                           plan_eblk=256)
    loader_s = BatchLoader(ds, 16, superbatch=0)
    r_p = eval_rmse(make_eval_step(fwd_p), params, loader_p)
    r_s = eval_rmse(make_eval_step(fwd_s), params, loader_s)
    assert abs(r_p - r_s) < 1e-4


@pytest.mark.slow
def test_igmc_forward_blocked_relmean_matches_segment():
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init

    batch = _collated_batch(seed=8)
    batch.blocked = plan_blocked_edges(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.edge_canon, batch.num_nodes, rows=64, eblk=256, group=4)
    cfg_seg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                         aggr="relmean")
    cfg_blk = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                         aggr="relmean", flat_aggregate="blocked")
    params = igmc_init(jax.random.PRNGKey(0), cfg_seg)
    ref = igmc_forward(params, batch, cfg_seg, None, False)
    out = igmc_forward(params, batch, cfg_blk, None, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients too (the bwd plan must carry the same relmean weights)
    def loss(fn_cfg):
        def f(p):
            o = igmc_forward(p, batch, fn_cfg, None, False)
            return jnp.sum(jnp.sin(o))
        return jax.grad(f)(params)

    g1, g2 = loss(cfg_blk), loss(cfg_seg)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_blocked_bf16_close_to_f32():
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init

    batch = _collated_batch(node_pad=384, seed=12)
    batch.blocked = plan_blocked_edges(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        batch.edge_canon, batch.num_nodes, rows=64, eblk=256, group=4)
    cfg32 = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                       flat_aggregate="blocked")
    cfg16 = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                       flat_aggregate="blocked", compute_dtype="bfloat16")
    params = igmc_init(jax.random.PRNGKey(0), cfg32)
    o32 = igmc_forward(params, batch, cfg32, None, False)
    o16 = igmc_forward(params, batch, cfg16, None, False)
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               rtol=0.05, atol=0.05)
