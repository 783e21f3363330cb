"""Model-family tests: sort-pool golden, GNN/DGCNN forward+grad, side
features, checkpoint roundtrip, prediction-averaged ensembling."""

import os

import pytest
import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.batching import collate
from igmc_tpu.models import (
    DGCNNConfig, GNNConfig, IGMCConfig,
    dgcnn_forward, dgcnn_init, gnn_forward, gnn_init, igmc_forward, igmc_init,
)
from igmc_tpu.ops.sort_pool import global_sort_pool
from igmc_tpu.train.checkpoints import load_checkpoint, save_checkpoint


def naive_sort_pool(x, node2graph, node_mask, B, k):
    N, D = x.shape
    out = np.zeros((B, k * D), np.float32)
    for b in range(B):
        rows = x[(node2graph == b) & node_mask]
        rows = rows[np.argsort(-rows[:, -1], kind="stable")][:k]
        out[b, : rows.size] = rows.reshape(-1)
    return out


def test_sort_pool_matches_naive():
    rng = np.random.default_rng(0)
    N, D, B, k = 64, 3, 5, 4
    x = rng.standard_normal((N, D)).astype(np.float32)
    n2g = np.sort(rng.integers(0, B, N)).astype(np.int32)
    mask = rng.random(N) < 0.8
    # graph 3 left empty to test the empty-graph guard
    mask[n2g == 3] = False
    got = np.asarray(global_sort_pool(jnp.asarray(x), jnp.asarray(n2g),
                                      jnp.asarray(mask), B, k))
    want = naive_sort_pool(x, n2g, mask, B, k)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def make_batch(n_graphs=8, node_pad=512, edge_pad=4096, seed=0,
               with_side=False):
    rng = np.random.default_rng(seed)
    M = (rng.random((40, 40)) < 0.35).astype(np.float32) * rng.integers(
        1, 6, (40, 40)
    ).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    uf = rng.standard_normal((40, 3)).astype(np.float32) if with_side else None
    vf = rng.standard_normal((40, 2)).astype(np.float32) if with_side else None
    graphs = extract_many((us[:n_graphs], vs[:n_graphs]), labels[:n_graphs],
                          A, h=1, u_features=uf, v_features=vf,
                          class_values=cv, backend="numpy")
    return collate(graphs, n_graphs, node_pad, edge_pad)


def test_gnn_forward_and_grad():
    batch = jax.device_put(make_batch())
    cfg = GNNConfig(num_features=4, adj_dropout=0.2)
    params = gnn_init(jax.random.PRNGKey(0), cfg)
    out = gnn_forward(params, batch, cfg, None, False)
    assert out.shape == (8,)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p, key):
        o = gnn_forward(p, batch, cfg, key, True)
        return jnp.sum((o - batch.y) ** 2)

    g = jax.grad(loss)(params, jax.random.PRNGKey(1))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_dgcnn_and_rs_forward_and_grad():
    batch = jax.device_put(make_batch())
    for relational in (False, True):
        cfg = DGCNNConfig(num_features=4, k=12, relational=relational,
                          num_relations=5, adj_dropout=0.2)
        params = dgcnn_init(jax.random.PRNGKey(0), cfg)
        out = dgcnn_forward(params, batch, cfg, None, False)
        assert out.shape == (8,)
        assert np.isfinite(np.asarray(out)).all()

        def loss(p, key):
            o = dgcnn_forward(p, batch, cfg, key, True)
            return jnp.sum((o - batch.y) ** 2)

        g = jax.grad(loss)(params, jax.random.PRNGKey(1))
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))


def test_igmc_side_features():
    batch = jax.device_put(make_batch(with_side=True))
    cfg = IGMCConfig(num_relations=5, num_bases=4, side_features=True,
                     n_side_features=5)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    out = igmc_forward(params, batch, cfg, None, False)
    assert out.shape == (8,)
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_roundtrip(tmp_path):
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    path = os.path.join(tmp_path, "model_checkpoint1.ckpt")
    save_checkpoint(path, params)
    template = igmc_init(jax.random.PRNGKey(42), cfg)  # different values
    loaded = load_checkpoint(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ensemble_averages_predictions(tmp_path):
    """eval_rmse_ensemble must average raw predictions, then take one RMSE
    (/root/reference/train_eval.py:208-245)."""
    from igmc_tpu.batching.dataset import BatchLoader
    from igmc_tpu.train.loop import eval_rmse_ensemble, make_eval_step

    batch = make_batch()

    class OneBatchDS:
        def __len__(self):
            return int(batch.graph_mask.sum())

        def get(self, i):
            raise NotImplementedError

    cfg = IGMCConfig(num_relations=5, num_bases=4)
    p1 = igmc_init(jax.random.PRNGKey(1), cfg)
    p2 = igmc_init(jax.random.PRNGKey(2), cfg)
    c1 = os.path.join(tmp_path, "model_checkpoint1.ckpt")
    c2 = os.path.join(tmp_path, "model_checkpoint2.ckpt")
    save_checkpoint(c1, p1)
    save_checkpoint(c2, p2)

    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    eval_fn = make_eval_step(fwd)

    class Loader:
        def __iter__(self):
            yield jax.device_put(batch)

    rmse = eval_rmse_ensemble(eval_fn, p1, [c1, c2], Loader())
    # oracle: mean of raw predictions, one RMSE
    o1 = np.asarray(igmc_forward(p1, jax.device_put(batch), cfg, None, False))
    o2 = np.asarray(igmc_forward(p2, jax.device_put(batch), cfg, None, False))
    gm = np.asarray(batch.graph_mask)
    mean = (o1 + o2)[gm] / 2
    want = float(np.sqrt(np.mean((mean - np.asarray(batch.y)[gm]) ** 2)))
    assert abs(rmse - want) < 1e-6


def test_visualize_writes_pdf(tmp_path):
    from igmc_tpu.graphs import extract_many
    from igmc_tpu.train.visualize import visualize

    rng = np.random.default_rng(0)
    M = (rng.random((30, 30)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (30, 30)).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)

    class DS:
        def __init__(self):
            self.graphs = extract_many((us[:20], vs[:20]), labels[:20], A,
                                       h=1, class_values=cv, backend="numpy")

        def __len__(self):
            return len(self.graphs)

        def get(self, i):
            return self.graphs[i]

        def node_counts(self):
            return np.array([g.num_nodes for g in self.graphs])

        def edge_counts(self):
            return np.array([g.num_edges for g in self.graphs])

    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    visualize(fwd, params, DS(), str(tmp_path), "unittest", cv, batch_size=10)
    pdfs = [f for f in os.listdir(tmp_path) if f.endswith(".pdf")]
    assert pdfs, "visualize() produced no PDF"


def test_arr_regularizer_skips_nonrelational_convs():
    """ARR must not crash on GCN trunks (GNN/DGCNN) and must count DGCNN_RS
    relation weights (regression: KeyError 'att' in CLI --model gnn)."""
    from igmc_tpu.models.igmc import arr_regularizer

    gnn_cfg = GNNConfig(num_features=4)
    gnn_params = gnn_init(jax.random.PRNGKey(0), gnn_cfg)
    assert float(arr_regularizer(gnn_params)) == 0.0

    rs_cfg = DGCNNConfig(num_features=4, relational=True, num_relations=5)
    rs_params = dgcnn_init(jax.random.PRNGKey(0), rs_cfg)
    assert float(arr_regularizer(rs_params)) > 0.0
