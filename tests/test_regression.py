"""Round-2 hardening tests: resume equivalence, golden RMSE, ladder
telemetry, cache digests, and stack-marker dispatch (VERDICT round 1)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from igmc_tpu.batching import StaticGraphDataset, collate
from igmc_tpu.batching.dataset import BatchLoader
from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.graphs.extract import Subgraph
from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
from igmc_tpu.train import train_multiple_epochs
from igmc_tpu.utils.logging import ResultsDir, make_logger


def _toy_matrix(seed=0, n=30, density=0.35, classes=5):
    rng = np.random.default_rng(seed)
    M = (rng.random((n, n)) < density).astype(np.float32) * rng.integers(
        1, classes + 1, (n, n)).astype(np.float32)
    return M


def _toy_dataset(seed=0, n_links=48):
    M = _toy_matrix(seed)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    return StaticGraphDataset(None, A, (us[:n_links], vs[:n_links]),
                              labels[:n_links], h=1, class_values=cv,
                              backend="numpy"), cv


def test_resume_equivalence(tmp_path):
    """train(4 epochs) must equal train(2) + resume(2): same params, same
    optimizer state, same final RMSE — the thing --continue-from is FOR
    (/root/reference/train_eval.py:56-64 semantics)."""
    train_ds, cv = _toy_dataset(seed=1)
    test_ds, _ = _toy_dataset(seed=2, n_links=24)
    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.2)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    kw = dict(batch_size=16, lr=1e-2, lr_decay_factor=0.1,
              lr_decay_step_size=3, ARR=0.001, test_freq=1, seed=7,
              progress=False, superbatch=0)

    res_a = ResultsDir(str(tmp_path), "toy", "_a", testing=True)
    rmse_a, state_a = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(3), cfg),
        epochs=4, logger=make_logger(res_a, save_interval=2),
        res_dir=res_a.path, **kw)

    # independent run: 2 epochs (checkpointing at 2), then resume 2 more
    res_b = ResultsDir(str(tmp_path), "toy", "_b", testing=True)
    train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(3), cfg),
        epochs=2, logger=make_logger(res_b, save_interval=2),
        res_dir=res_b.path, **kw)
    rmse_b, state_b = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(3), cfg),
        epochs=4, logger=make_logger(res_b, save_interval=2),
        res_dir=res_b.path, continue_from=2, **kw)

    assert rmse_a == pytest.approx(rmse_b, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_b.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_golden_rmse_regression():
    """Deterministic toy run pinned to a tight band: a numerics regression
    (aggregation, dropout masking, LR decay, loss normalization) moves this
    where `rmse < 4.0` smoke tests would not."""
    train_ds, cv = _toy_dataset(seed=5, n_links=64)
    test_ds, _ = _toy_dataset(seed=6, n_links=32)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    rmse, _ = train_multiple_epochs(
        train_ds, test_ds, fwd, igmc_init(jax.random.PRNGKey(11), cfg),
        epochs=6, batch_size=16, lr=1e-2, lr_decay_factor=0.1,
        lr_decay_step_size=20, ARR=0.001, test_freq=2, seed=11,
        progress=False, superbatch=4)
    # golden value measured on the 8-device CPU mesh at round 2
    assert rmse == pytest.approx(GOLDEN_RMSE, abs=1e-3), rmse


GOLDEN_RMSE = 1.7772686  # measured 2026-08-17, 8-device CPU mesh, jax 0.9


def test_ladder_overflow_telemetry_and_reuse():
    """An adversarial power-law dynamic dataset whose sampled ladder
    estimate runs low must (a) count overflow events, (b) EXTEND the ladder
    so later oversized batches reuse the minted shape instead of
    recompiling per batch."""

    def graph(n_nodes):
        n_u = max(1, n_nodes // 2)
        n_v = n_nodes - n_u
        src = np.repeat(np.arange(n_u, dtype=np.int32), 2)[: n_nodes]
        dst = n_u + np.resize(np.arange(n_v, dtype=np.int32), len(src))
        lab = np.zeros(n_nodes, np.int32)
        lab[n_u:] = 1
        return Subgraph(src=src, dst=dst,
                        etype=np.zeros(len(src), np.int32),
                        node_label=lab, num_u=n_u, num_v=n_v, y=3.0)

    n = 200
    sampled = set(np.linspace(0, n - 1, num=64, dtype=np.int64).tolist())
    giants = {i for i in range(n) if i not in sampled}

    class PowerLaw:
        # the ladder estimator samples `sampled`; the giants hide elsewhere
        def __len__(self):
            return n

        def get(self, i):
            return graph(400 if i in giants else 8)

    loader = BatchLoader(PowerLaw(), batch_size=4, device_put=False,
                         prefetch=0)
    small_ladder_top = loader.node_ladder[-1]
    shapes = set()
    for b in loader:
        shapes.add(b.shape_key())
    assert loader.ladder_overflows >= 1
    assert loader.node_ladder[-1] > small_ladder_top  # ladder extended
    # every oversized batch reuses the extended size: few distinct shapes
    assert len(shapes) <= 4, shapes


def test_batchloader_refuses_auto_ladders_multiprocess(monkeypatch):
    """Auto-estimated ladders diverge between hosts (ADVICE round 1);
    multi-process runs must pass explicit ladders."""
    ds, _ = _toy_dataset()
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="explicit identical"):
        BatchLoader(ds, batch_size=8, device_put=False)
    # explicit ladders are accepted
    BatchLoader(ds, batch_size=8, device_put=False,
                node_ladder=[512], edge_ladder=[2048])


def test_eval_dispatch_rejects_device_stack():
    """make_eval_step must refuse a device-stacked batch instead of
    silently scanning over the device axis (ADVICE round 1)."""
    from igmc_tpu.parallel.dp import stack_batches
    from igmc_tpu.train.loop import make_eval_step

    ds, cv = _toy_dataset()
    graphs = [ds.get(i) for i in range(4)]
    sub = collate(graphs, 4, 256, 1024)
    stacked = stack_batches([sub, sub], kind="devices")
    cfg = IGMCConfig(num_relations=5, num_bases=2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    ev = make_eval_step(fwd)
    with pytest.raises(ValueError, match="device-stacked"):
        ev(params, stacked)
    # superbatch stacks still scan
    sup = stack_batches([sub, sub], kind="superbatch")
    sse, cnt, _ = ev(params, sup)
    assert float(cnt) == 8.0


def test_cache_key_covers_adjacency_values(tmp_path):
    """Re-running with rewritten adjacency VALUES (what --standard-rating /
    post_rating_map do) must MISS the cache, not silently serve stale
    subgraphs (ADVICE round 1, medium)."""
    M = _toy_matrix(seed=3)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    root = str(tmp_path / "ds")
    ds1 = StaticGraphDataset(root, A, (us[:16], vs[:16]), labels[:16], h=1,
                             class_values=cv, backend="numpy")
    # bucket every rating into one class — same sparsity pattern, new values
    A2 = A.copy()
    A2.data = np.ones_like(A2.data)
    ds2 = StaticGraphDataset(root, A2, (us[:16], vs[:16]),
                             np.zeros(16, np.int64), h=1,
                             class_values=np.asarray([1.0]), backend="numpy")
    caches = os.listdir(os.path.join(root, "processed"))
    assert len(caches) == 2, caches  # distinct cache entries
    t1 = np.concatenate([ds1.get(i).etype for i in range(4)])
    t2 = np.concatenate([ds2.get(i).etype for i in range(4)])
    assert t2.max() == 0 and t1.max() > 0  # ds2 really re-extracted


def test_loader_shuffle_uses_absolute_epoch():
    """Host loader and device-resident path must derive identical orders
    from SeedSequence([seed, epoch]) (ADVICE round 1: cross-path
    reproducibility)."""
    ds, _ = _toy_dataset()
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=9,
                         device_put=False)
    loader.epoch = 3  # what train_multiple_epochs sets before epoch 3
    order = loader._order()
    expect = np.random.default_rng(
        np.random.SeedSequence([9, 3])).permutation(len(ds))
    np.testing.assert_array_equal(order, expect)
