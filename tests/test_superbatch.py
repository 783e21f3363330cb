"""Superbatch (scanned multi-step) parity: K scanned steps must equal K
individual steps bit-for-bit in structure and near-exactly in values."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.batching import collate
from igmc_tpu.batching.dataset import BatchLoader
from igmc_tpu.models import IGMCConfig, igmc_init, igmc_forward
from igmc_tpu.parallel.dp import stack_batches
from igmc_tpu.train.loop import (
    make_eval_step, make_optimizer, make_scan_train_step, make_train_step,
)


def make_batches(k=4, n_graphs=8, seed=0):
    rng = np.random.default_rng(seed)
    M = (rng.random((40, 40)) < 0.35).astype(np.float32) * rng.integers(
        1, 6, (40, 40)).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    out = []
    for i in range(k):
        sl = slice(i * n_graphs, (i + 1) * n_graphs)
        graphs = extract_many((us[sl], vs[sl]), labels[sl], A, h=1,
                              class_values=cv, backend="numpy")
        out.append(collate(graphs, n_graphs, 512, 4096))
    return out


def test_scan_step_matches_individual_steps():
    batches = make_batches(k=4)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-3)
    key = jax.random.PRNGKey(7)

    # path A: individual steps with fold_in(key, i)
    # (fresh buffer copies: the jitted steps donate their inputs)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    step = make_train_step(fwd, opt, ARR=0.001)
    pa, sa = copy(params), opt.init(copy(params))
    total_a = 0.0
    for i, b in enumerate(batches):
        pa, sa, loss, n = step(pa, sa, jax.device_put(b),
                               jax.random.fold_in(key, i))
        total_a += float(loss) * float(n)

    # path B: one scanned dispatch
    scan = make_scan_train_step(fwd, opt, ARR=0.001)
    stacked = jax.device_put(stack_batches(batches))
    pb, sb = copy(params), opt.init(copy(params))
    pb, sb, contrib, ns = scan(pb, sb, stacked, key, jnp.asarray(0, jnp.int32))

    assert abs(total_a - float(contrib)) < 1e-3 * max(1.0, abs(total_a))
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eval_dispatch_handles_stacked():
    batches = make_batches(k=3, seed=2)
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(1), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    ev = make_eval_step(fwd)
    sse_i = sum(float(ev(params, jax.device_put(b))[0]) for b in batches)
    cnt_i = sum(float(ev(params, jax.device_put(b))[1]) for b in batches)
    sse_s, cnt_s, _ = ev(params, jax.device_put(stack_batches(batches)))
    assert abs(sse_i - float(sse_s)) < 1e-3
    assert cnt_i == float(cnt_s)


def test_loader_superbatch_covers_all_graphs():
    class DS:
        def __init__(self, graphs):
            self.graphs = graphs

        def __len__(self):
            return len(self.graphs)

        def get(self, i):
            return self.graphs[i]

        def node_counts(self):
            return np.array([g.num_nodes for g in self.graphs])

        def edge_counts(self):
            return np.array([g.num_edges for g in self.graphs])

    rng = np.random.default_rng(0)
    M = (rng.random((40, 40)) < 0.35).astype(np.float32) * rng.integers(
        1, 6, (40, 40)).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    graphs = extract_many((us[:43], vs[:43]), labels[:43], A, h=1,
                          class_values=cv, backend="numpy")
    loader = BatchLoader(DS(graphs), 4, shuffle=False, device_put=False,
                         superbatch=3)
    seen = 0
    shapes = []
    for b in loader:
        if b.y.ndim == 2:
            seen += int(b.graph_mask.sum())
            shapes.append("stacked")
        else:
            seen += int(b.graph_mask.sum())
            shapes.append("flat")
    assert seen == 43
    # 43 graphs / batch 4 -> 11 batches -> 3 superbatches of 3 + 2 flat
    assert shapes.count("stacked") == 3
    assert shapes.count("flat") == 2
