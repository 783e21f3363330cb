"""Edge-partitioned (EP) model parallelism tests on the 8-device CPU mesh."""

import pytest
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
    # every real edge lands on exactly one chip, in exactly one group
    n_real = int(ep.intra_mask.sum()) + int(ep.bnd_mask.sum())
    assert n_real == int(batch.edge_mask.sum())
    # each edge's dst is local to its chip; boundary srcs index the halo table
    D, _, P = ep.send_idx.shape
    for d in range(8):
        mi, mb = ep.intra_mask[d], ep.bnd_mask[d]
        for dst in (ep.intra_dst[d][mi], ep.bnd_dst[d][mb]):
            assert (dst >= 0).all() and (dst < 64).all()
        assert (ep.intra_src[d][mi] < 64).all()
        assert (ep.bnd_src[d][mb] < D * P).all()
        # no boundary slot claims to come from this chip itself
        assert (ep.bnd_src[d][mb] // P != d).all()


def test_halo_exchange_delivers_correct_rows():
    """The all_to_all halo must deliver exactly the remote source rows each
    boundary edge reads: reconstruct every boundary edge's source feature
    from the halo table and compare with the flat batch's truth."""
    batch = make_batch(seed=5)
    D = 8
    ep = partition_batch(batch, D)
    Nl = ep.node_label.shape[1]
    P = ep.send_idx.shape[2]
    # simulate the exchange on the host: x = global node ids as "features"
    x_global = np.arange(D * Nl).reshape(D, Nl)
    halo = np.zeros((D, D * P), np.int64)
    for r in range(D):
        for s in range(D):
            halo[r, s * P:(s + 1) * P] = x_global[s][ep.send_idx[s, r]]
    # map flat edges (dst-owned) back and check each boundary source
    src = np.asarray(batch.edge_src)
    dst = np.asarray(batch.edge_dst)
    flat_pairs = {}
    em = np.asarray(batch.edge_mask)
    for e in np.nonzero(em)[0]:
        flat_pairs.setdefault((int(dst[e]), int(batch.edge_type[e]),
                               int(batch.edge_canon[e])), []).append(int(src[e]))
    for d in range(D):
        for e in np.nonzero(ep.bnd_mask[d])[0]:
            gdst = d * Nl + int(ep.bnd_dst[d, e])
            key = (gdst, int(ep.bnd_type[d, e]), int(ep.bnd_pair[d, e]))
            got = int(halo[d, ep.bnd_src[d, e]])
            assert got in flat_pairs[key]


def test_comm_stats_reduction():
    """Boundary-only exchange must move far fewer bytes than the per-layer
    full all_gather it replaced (VERDICT round-1 item 1)."""
    from igmc_tpu.parallel.ep import comm_stats

    batch = make_batch()
    ep = partition_batch(batch, 8)
    stats = comm_stats(ep, feature_width=32, n_layers=4, readout_width=128)
    assert stats["halo_bytes_total"] < stats["allgather_bytes_total"]
    assert stats["reduction_x"] > 1.0
    assert stats["halo_rows_per_pair"] < stats["local_nodes"] * 8


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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

    Nl = ep.node_label.shape[1]
    for fu in (True, False):
        # group keep decisions by undirected pair id over real edges,
        # across both the intra and boundary groups
        from collections import defaultdict

        by_pair = defaultdict(list)
        for pair, ldst, mask in (
            (ep.intra_pair, ep.intra_dst, ep.intra_mask),
            (ep.bnd_pair, ep.bnd_dst, ep.bnd_mask),
        ):
            D = pair.shape[0]
            gdst = _np.arange(D)[:, None] * Nl + _np.asarray(ldst)
            key_id = dropout_key_ids(fu, jnp.asarray(pair),
                                     jnp.asarray(gdst))
            keep = _np.asarray(hash_edge_keep(jnp.uint32(3), key_id, 0.5))
            m = _np.asarray(mask)
            for d in range(D):
                for e in _np.nonzero(m[d])[0]:
                    by_pair[int(pair[d, e])].append(bool(keep[d, e]))
        pairs_with_both = {p: v for p, v in by_pair.items() if len(v) == 2}
        assert pairs_with_both, "expected undirected edge pairs in the batch"
        agree = [a == b for a, b in pairs_with_both.values()]
        if fu:
            assert all(agree)  # tied
        else:
            assert not all(agree)  # at p=0.5 some pairs must disagree


@pytest.mark.slow
def test_pad_ep_batch_preserves_forward():
    """Growing the static caps (shared-shape epoch batches) must not change
    the forward output: halo slots are renumbered consistently."""
    from igmc_tpu.parallel.ep import EPCaps, ep_batch_caps, pad_ep_batch

    batch = make_batch(seed=13)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(3), cfg)
    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    caps = ep_batch_caps(ep)
    big = EPCaps(caps.intra + 16, caps.bnd + 8, caps.halo + 8, caps.tgt + 8)
    ep2 = pad_ep_batch(ep, big)
    fwd = make_ep_forward(cfg, mesh)
    o1 = fwd(params, jax.device_put(ep), jnp.uint32(0), training=False)
    o2 = fwd(params, jax.device_put(ep2), jnp.uint32(0), training=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-6, atol=1e-6)


def _tiny_static_dataset(n_links=48, seed=0):
    from igmc_tpu.batching import StaticGraphDataset

    rng = np.random.default_rng(seed)
    M = (rng.random((30, 30)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (30, 30)).astype(np.float32)
    Ms = sp.csr_matrix(M)
    us, vs = Ms.nonzero()
    labels = (np.asarray(Ms[us, vs]).ravel() - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    n = min(n_links, len(us))
    return StaticGraphDataset(None, Ms, (us[:n], vs[:n]), labels[:n], h=1,
                              class_values=cv)


def test_build_ep_batches_shared_shape_and_prediction_order():
    """All EP batches of a dataset share one static shape (one compiled
    program), and ep_predict_all restores dataset prediction order exactly
    (vs the flat single-device forward)."""
    from igmc_tpu.parallel.ep import build_ep_batches, ep_predict_all
    from igmc_tpu.batching.batch import collate

    ds = _tiny_static_dataset(40)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    eps, chunks = build_ep_batches(ds, 16, 8)
    assert len(eps) == 3
    shapes = {tuple(np.shape(getattr(e, f)) for f in
                    ("intra_src", "bnd_src", "send_idx", "tgt_send_idx"))
              for e in eps}
    assert len(shapes) == 1, "EP epoch batches must share one static shape"

    ev = make_ep_eval_step(cfg, mesh)
    preds = ep_predict_all(ev, params, eps, chunks, len(ds))
    assert np.isfinite(preds).all()

    # flat single-device reference over the same composition
    graphs = [ds.get(i) for i in range(len(ds))]
    nb = sum(g.num_nodes for g in graphs)
    eb = sum(g.num_edges for g in graphs)
    flat = collate(graphs, len(ds), -(-nb // 8) * 8, -(-eb // 8) * 8)
    ref = igmc_forward(params, jax.device_put(flat), cfg, None, False)
    np.testing.assert_allclose(preds, np.asarray(ref)[: len(ds)],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ep_training_loop_decreases_and_resumes(tmp_path):
    """train_multiple_epochs_ep: loss decreases over epochs; a run
    checkpointed at epoch 2 and resumed with continue_from=2 reproduces
    the uninterrupted run's final RMSE exactly (absolute-epoch seeding)."""
    from igmc_tpu.train import train_multiple_epochs_ep
    from igmc_tpu.utils import ResultsDir, make_logger

    train_ds = _tiny_static_dataset(40, seed=1)
    test_ds = _tiny_static_dataset(24, seed=2)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)

    losses = []
    logger = lambda info, state: losses.append(info["train_loss"])
    kw = dict(epochs=4, batch_size=16, lr=1e-2, lr_decay_factor=0.1,
              lr_decay_step_size=50, ARR=0.001, test_freq=1,
              seed=7, progress=False)
    res = ResultsDir(str(tmp_path / "results"), "tiny", "", True)
    saver = make_logger(res, save_interval=1)
    rmse_full, _ = train_multiple_epochs_ep(
        train_ds, test_ds, cfg, params, mesh=mesh,
        logger=lambda i, s: (losses.append(i["train_loss"]), saver(i, s)),
        res_dir=res.path, **kw)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    rmse_resumed, _ = train_multiple_epochs_ep(
        train_ds, test_ds, cfg, params, mesh=mesh, continue_from=2,
        res_dir=res.path, **kw)
    assert abs(rmse_resumed - rmse_full) < 1e-6


@pytest.mark.slow
def test_ep_blocked_local_aggregate_matches_segment():
    """EP with the blocked local aggregate (build_ep_blocked plans) must
    match the segment EP forward exactly — eval AND training mode (the
    plans' ukeys reproduce the EP hash-dropout stream bit-for-bit)."""
    from igmc_tpu.parallel.ep import build_ep_blocked

    batch = make_batch(seed=17)
    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    plans = build_ep_blocked(ep, rows=16, eblk=64, group=2)
    for aggr in ("mean", "sum"):
        cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2,
                         aggr=aggr)
        params = igmc_init(jax.random.PRNGKey(6), cfg)
        fwd = make_ep_forward(cfg, mesh)
        epd = jax.device_put(ep)
        for training in (False, True):
            ref = fwd(params, epd, jnp.uint32(11), training=training)
            out = fwd(params, epd, jnp.uint32(11), training=training,
                      plans=plans)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"{aggr} training={training}")


@pytest.mark.slow
def test_ep_blocked_train_step_decreases_loss():
    from igmc_tpu.parallel.ep import build_ep_blocked

    batch = make_batch(seed=19)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    plans = build_ep_blocked(ep, rows=16, eblk=64, group=2)
    epd = jax.device_put(ep)
    opt = make_optimizer(1e-2)
    step, _, _ = make_ep_train_step(cfg, opt, ARR=0.001, mesh=mesh)
    state = opt.init(params)
    losses = []
    for i in range(8):
        params, state, loss, n = step(params, state, epd, jnp.uint32(i),
                                      plans)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ep_blocked_training_loop_cli_equivalent():
    """train_multiple_epochs_ep(local_aggregate='blocked') runs end-to-end
    and learns."""
    from igmc_tpu.train import train_multiple_epochs_ep

    train_ds = _tiny_static_dataset(40, seed=5)
    test_ds = _tiny_static_dataset(24, seed=6)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    losses = []
    rmse, _ = train_multiple_epochs_ep(
        train_ds, test_ds, cfg, params, mesh=mesh, epochs=3,
        batch_size=16, lr=1e-2, lr_decay_factor=0.1,
        lr_decay_step_size=50, ARR=0.001, test_freq=1, seed=3,
        progress=False, local_aggregate="blocked",
        logger=lambda i, s: losses.append(i["train_loss"]))
    assert np.isfinite(rmse)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_ep_blocked_relmean_matches_segment():
    from igmc_tpu.parallel.ep import build_ep_blocked

    batch = make_batch(seed=23)
    mesh = make_mesh(n_data=8)
    ep = partition_batch(batch, 8)
    plans = build_ep_blocked(ep, rows=16, eblk=64, group=2)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                     aggr="relmean")
    params = igmc_init(jax.random.PRNGKey(8), cfg)
    fwd = make_ep_forward(cfg, mesh)
    epd = jax.device_put(ep)
    ref = fwd(params, epd, jnp.uint32(0), training=False)
    out = fwd(params, epd, jnp.uint32(0), training=False, plans=plans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
