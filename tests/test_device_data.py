"""Device-resident batch assembly: parity with the host collate path."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.batching import collate
from igmc_tpu.batching.dataset import _PackedGraphs
from igmc_tpu.batching.device_data import (DeviceDataset, assemble_batch,
                                           capacity_bound, plan_gid_epoch)
from igmc_tpu.models import IGMCConfig, igmc_init, igmc_forward


def make_packed(n=24, seed=0, with_side=False):
    rng = np.random.default_rng(seed)
    M = (rng.random((40, 40)) < 0.35).astype(np.float32) * rng.integers(
        1, 6, (40, 40)).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    uf = rng.standard_normal((40, 3)).astype(np.float32) if with_side else None
    vf = rng.standard_normal((40, 2)).astype(np.float32) if with_side else None
    graphs = extract_many((us[:n], vs[:n]), labels[:n], A, h=1,
                          u_features=uf, v_features=vf, class_values=cv,
                          backend="numpy")
    return graphs, _PackedGraphs(graphs)


def test_assemble_matches_host_collate_outputs():
    graphs, packed = make_packed()
    B = 8
    npad, epad = capacity_bound(np.diff(packed.node_offsets),
                                2 * np.diff(packed.edge_offsets), B)
    dd = DeviceDataset(packed, npad, epad, B)
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)

    gids = np.array([3, 11, 0, 7, 20, 5, -1, -1], np.int32)
    dev_batch = assemble_batch(dd, jnp.asarray(gids))
    out_dev = igmc_forward(params, dev_batch, cfg, None, False)

    host_graphs = [graphs[i] for i in gids if i >= 0]
    host_batch = jax.device_put(collate(host_graphs, B, npad, epad))
    out_host = igmc_forward(params, host_batch, cfg, None, False)

    # compare REAL graphs only: padding rows (graph_mask False) hold garbage
    # predictions in both paths and are excluded from loss/eval by the mask
    real = np.asarray(dev_batch.graph_mask)
    np.testing.assert_allclose(np.asarray(out_dev)[real],
                               np.asarray(out_host)[real],
                               rtol=2e-5, atol=2e-5)
    # structural invariants
    assert int(dev_batch.graph_mask.sum()) == 6
    np.testing.assert_array_equal(np.asarray(dev_batch.y)[:6],
                                  np.asarray(host_batch.y)[:6])
    assert int(dev_batch.edge_mask.sum()) == int(host_batch.edge_mask.sum())
    assert int(dev_batch.node_mask.sum()) == int(host_batch.node_mask.sum())


def test_assemble_with_side_features():
    graphs, packed = make_packed(with_side=True)
    B = 6
    npad, epad = capacity_bound(np.diff(packed.node_offsets),
                                2 * np.diff(packed.edge_offsets), B)
    dd = DeviceDataset(packed, npad, epad, B)
    gids = jnp.asarray(np.array([1, 4, 9, -1, -1, -1], np.int32))
    b = assemble_batch(dd, gids)
    assert b.u_feat.shape == (B, 3) and b.v_feat.shape == (B, 2)
    np.testing.assert_allclose(np.asarray(b.u_feat[0]), graphs[1].u_feat,
                               rtol=1e-6)
    assert float(jnp.abs(b.u_feat[3]).sum()) == 0.0  # masked rows zeroed


def test_device_training_matches_host_path():
    """train_multiple_epochs must give the same losses through the
    device-resident path as the host superbatch path (same RNG scheme)."""
    from igmc_tpu.train.loop import (device_train_epoch, make_device_train_step,
                                     make_optimizer, make_scan_train_step,
                                     TrainState)
    from igmc_tpu.parallel.dp import stack_batches

    graphs, packed = make_packed(n=24, seed=2)
    B, K = 4, 3
    npad, epad = capacity_bound(np.diff(packed.node_offsets),
                                2 * np.diff(packed.edge_offsets), B)
    dd = DeviceDataset(packed, npad, epad, B)
    # adj_dropout=0: the edge-dropout Bernoulli is drawn by edge POSITION and
    # the two paths use different (equivalent) edge layouts, so only the
    # dropout-free numerics are exactly comparable. Feature dropout (same
    # [B, 128] layout in both) stays on.
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-3)
    key = jax.random.PRNGKey(5)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    order = np.arange(24, dtype=np.int64)

    # device path
    dev_step = make_device_train_step(fwd, opt, ARR=0.001)
    st_d = TrainState(params=copy(params), opt_state=opt.init(copy(params)))
    loss_d = float(device_train_epoch(dev_step, st_d, dd, order, key,
                                      24, K)) / 24

    # host superbatch path over the same graph order
    scan = make_scan_train_step(fwd, opt, ARR=0.001)
    p_h, s_h = copy(params), opt.init(copy(params))
    total = 0.0
    for g0 in range(0, 24, B * K):
        subs = [collate([graphs[i] for i in order[s : s + B]], B, npad, epad)
                for s in range(g0, g0 + B * K, B)]
        stacked = jax.device_put(stack_batches(subs))
        p_h, s_h, contrib, _ = scan(p_h, s_h, stacked, key,
                                    jnp.asarray(g0 // B, jnp.int32))
        total += float(contrib)
    loss_h = total / 24

    assert abs(loss_d - loss_h) < 1e-4 * max(1.0, abs(loss_h))
    for a, b in zip(jax.tree_util.tree_leaves(st_d.params),
                    jax.tree_util.tree_leaves(p_h)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_plan_gid_epoch_covers_everything():
    graphs, packed = make_packed(n=23)
    dd = DeviceDataset(packed, 512, 4096, 4)
    order = np.random.default_rng(0).permutation(23)
    supers, rest = plan_gid_epoch(dd, order, 2)
    assert rest == []
    seen = []
    for blk in supers[:-1]:
        assert blk.shape == (2, 4)
        seen += [int(x) for x in blk.ravel() if x >= 0]
    # 23 graphs / B=4 -> 6 blocks; K=2 -> 3 full supers, no remainder
    assert supers[-1].shape == (2, 4)
    seen += [int(x) for x in supers[-1].ravel() if x >= 0]
    assert sorted(seen) == list(range(23))

    # 23 graphs at B=4, K=4 -> 6 blocks = 1 full super + a remainder of 2
    # blocks PADDED to the same [4, 4] shape with all-(-1) rows (one
    # compiled program per (B, K)); live_rows reports the real rows.
    from igmc_tpu.batching.device_data import live_rows

    supers, rest = plan_gid_epoch(dd, order, 4)
    assert rest == []
    assert supers[0].shape == (4, 4) and supers[1].shape == (4, 4)
    assert live_rows(supers[0]) == 4 and live_rows(supers[1]) == 2
    assert (supers[1][2:] == -1).all()
    seen = [int(x) for blk in supers for x in blk.ravel() if x >= 0]
    assert sorted(seen) == list(range(23))

def test_dead_row_step_is_noop():
    """A [K, B] block whose trailing rows are all -1 (plan padding) must
    train EXACTLY like the unpadded [r, B] block: same params, same
    loss*n sum — the ARR penalty must not leak an optimizer step in."""
    from igmc_tpu.train.loop import make_device_train_step, make_optimizer

    graphs, packed = make_packed(n=8, seed=3)
    B = 4
    npad, epad = capacity_bound(np.diff(packed.node_offsets),
                                2 * np.diff(packed.edge_offsets), B)
    dd = DeviceDataset(packed, npad, epad, B)
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-3)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    key = jax.random.PRNGKey(7)
    step = make_device_train_step(fwd, opt, ARR=0.001)

    real = np.arange(8, dtype=np.int32).reshape(2, 4)
    padded = np.concatenate([real, np.full((2, 4), -1, np.int32)])

    zero = np.zeros((), np.float32)
    p1, s1, t1, _ = step(copy(params), opt.init(copy(params)), zero, dd,
                         jnp.asarray(real), key, jnp.int32(0))
    p2, s2, t2, _ = step(copy(params), opt.init(copy(params)), zero, dd,
                         jnp.asarray(padded), key, jnp.int32(0))
    assert float(t1) == float(t2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_tables_compact_dtypes():
    """The resident tables store the narrowest lossless integer dtype
    (src/dst are graph-local, labels/etypes tiny enums) — at ml_1m full
    scale this halves HBM residency, the difference between fitting one
    chip or not. Assembly upcasts after the gather, so outputs are
    unchanged (parity is covered by the tests above, which now run
    against compacted tables)."""
    _, packed = make_packed()
    B = 8
    npad, epad = capacity_bound(np.diff(packed.node_offsets),
                                2 * np.diff(packed.edge_offsets), B)
    dd = DeviceDataset(packed, npad, epad, B)
    assert dd.node_label.dtype == jnp.int8       # labels are 0..2h+1
    assert dd.etype.dtype == jnp.int8            # 5 relations
    assert dd.src.dtype in (jnp.int8, jnp.int16)  # graph-local indices
    assert dd.dst.dtype in (jnp.int8, jnp.int16)
    batch = jax.jit(assemble_batch, static_argnums=())(
        dd, jnp.arange(B, dtype=jnp.int32))
    assert batch.edge_src.dtype == jnp.int32     # downstream sees int32
    assert batch.node_label.dtype == jnp.int32

    # int32 addressing guard: oversized offsets refuse loudly
    import pytest
    big = _PackedGraphs([])
    big.__dict__.update(packed.__dict__)
    big.edge_offsets = packed.edge_offsets.copy().astype(np.int64)
    big.edge_offsets[-1] = 2**31
    with pytest.raises(ValueError, match="int32 addressing"):
        DeviceDataset(big, npad, epad, B)
