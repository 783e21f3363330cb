"""Edge-partitioned (EP) model parallelism tests on the 8-device CPU mesh."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.batching import collate
from igmc_tpu.models import IGMCConfig, igmc_init, igmc_forward
from igmc_tpu.parallel import make_mesh
from igmc_tpu.parallel.ep import (
    EPBatch, dropout_key_ids, hash_edge_keep, make_ep_eval_step,
    make_ep_forward, make_ep_train_step, partition_batch,
)
from igmc_tpu.train.loop import make_optimizer


def make_batch(n_graphs=16, node_pad=512, edge_pad=4096, seed=0):
    rng = np.random.default_rng(seed)
    M = (rng.random((40, 40)) < 0.35).astype(np.float32) * rng.integers(
        1, 6, (40, 40)
    ).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    graphs = extract_many((us[:n_graphs], vs[:n_graphs]), labels[:n_graphs],
                          A, h=1, class_values=cv, backend="numpy")
    return collate(graphs, n_graphs, node_pad, edge_pad)


def test_partition_roundtrip_counts():
    batch = make_batch()
    ep = partition_batch(batch, 8)
    assert ep.node_label.shape == (8, 64)
    # every real edge lands on exactly one chip
    assert int(ep.edge_mask.sum()) == int(batch.edge_mask.sum())
    # each edge's dst is owned by its chip
    for d in range(8):
        m = ep.edge_mask[d]
        assert (ep.edge_dst[d][m] >= 0).all()
        assert (ep.edge_dst[d][m] < 64).all()


def test_ep_forward_matches_single_device():
    batch = make_batch()
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)

    ref = igmc_forward(params, jax.device_put(batch), cfg, None, False)

    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    fwd = make_ep_forward(cfg, mesh)
    out = fwd(params, jax.device_put(ep), jnp.uint32(0), training=False)
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ep_train_step_decreases_loss():
    batch = make_batch()
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    ep = jax.device_put(partition_batch(batch, 8))
    opt = make_optimizer(1e-2)
    step, shd, rep = make_ep_train_step(cfg, opt, ARR=0.001, mesh=mesh)
    state = opt.init(params)
    losses = []
    for i in range(8):
        params, state, loss, n = step(params, state, ep, jnp.uint32(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ep_eval_matches_single_rmse():
    batch = make_batch(seed=3)
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(1), cfg)
    mesh = make_mesh(n_data=8)
    ep = jax.device_put(partition_batch(batch, 8))
    ev = make_ep_eval_step(cfg, mesh)
    sse, cnt, _ = ev(params, ep)
    ref = igmc_forward(params, jax.device_put(batch), cfg, None, False)
    gm = np.asarray(batch.graph_mask, np.float32)
    ref_sse = float(np.sum((np.asarray(ref) - np.asarray(batch.y)) ** 2 * gm))
    assert abs(float(sse) - ref_sse) < 1e-3
    assert int(cnt) == int(gm.sum())


def test_hash_edge_keep_deterministic_and_unbiased():
    ids = jnp.arange(200_000, dtype=jnp.int32)
    k1 = hash_edge_keep(jnp.uint32(7), ids, 0.3)
    k2 = hash_edge_keep(jnp.uint32(7), ids, 0.3)
    assert bool(jnp.all(k1 == k2))
    rate = float(jnp.mean(k1.astype(jnp.float32)))
    assert abs(rate - 0.7) < 0.01
    k3 = hash_edge_keep(jnp.uint32(8), ids, 0.3)
    assert not bool(jnp.all(k1 == k3))


def test_ep_forward_matches_single_device_sum_aggr():
    batch = make_batch(seed=9)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0, aggr="sum")
    params = igmc_init(jax.random.PRNGKey(2), cfg)
    ref = igmc_forward(params, jax.device_put(batch), cfg, None, False)
    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    fwd = make_ep_forward(cfg, mesh)
    out = fwd(params, jax.device_put(ep), jnp.uint32(0), training=False)
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ep_forward_matches_single_device_relmean_aggr():
    batch = make_batch(seed=11)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                     aggr="relmean")
    params = igmc_init(jax.random.PRNGKey(4), cfg)
    ref = igmc_forward(params, jax.device_put(batch), cfg, None, False)
    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    fwd = make_ep_forward(cfg, mesh)
    out = fwd(params, jax.device_put(ep), jnp.uint32(0), training=False)
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ep_dropout_direction_tying_follows_config():
    """force_undirected=True must drop both directed copies of an edge
    together; force_undirected=False must drop them independently."""
    batch = make_batch()
    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    # Per-edge keep decisions via the SAME production functions
    # make_ep_forward composes (dropout_key_ids -> hash_edge_keep).
    import numpy as _np

    for fu in (True, False):
        epair = _np.asarray(ep.edge_pair)
        key_id = dropout_key_ids(fu, jnp.asarray(ep.edge_pair),
                                 jnp.asarray(ep.edge_src))
        keep = _np.asarray(hash_edge_keep(jnp.uint32(3), key_id, 0.5))
        mask = _np.asarray(ep.edge_mask)
        # group keep decisions by undirected pair id over real edges
        from collections import defaultdict

        by_pair = defaultdict(list)
        for d in range(keep.shape[0]):
            for e in _np.nonzero(mask[d])[0]:
                by_pair[int(epair[d, e])].append(bool(keep[d, e]))
        pairs_with_both = {p: v for p, v in by_pair.items() if len(v) == 2}
        assert pairs_with_both, "expected undirected edge pairs in the batch"
        agree = [a == b for a, b in pairs_with_both.values()]
        if fu:
            assert all(agree)  # tied
        else:
            assert not all(agree)  # at p=0.5 some pairs must disagree
