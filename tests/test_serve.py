"""Serving path (igmc_tpu/serve.py): Predictor must reproduce the eval
pipeline's scores exactly and handle ensembles / pinned slot ladders."""

import os

import numpy as np
import pytest

import jax

MONTI_AVAILABLE = (os.path.isdir("/root/reference/raw_data/flixster")
                   or os.path.isdir("raw_data/flixster"))


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
@pytest.mark.slow
def test_predictor_matches_eval_and_ensembles(tmp_path):
    from igmc_tpu.batching import StaticGraphDataset
    from igmc_tpu.data import load_data_monti
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.serve import Predictor
    from igmc_tpu.train import train_multiple_epochs
    from igmc_tpu.train.checkpoints import save_checkpoint

    split = load_data_monti("flixster", testing=True)
    n = 200
    tr = StaticGraphDataset(None, split.adj_train,
                            (split.train_u_indices[:n],
                             split.train_v_indices[:n]),
                            split.train_labels[:n], h=1,
                            class_values=split.class_values)
    te_pairs = (split.test_u_indices[:80], split.test_v_indices[:80])
    te = StaticGraphDataset(None, split.adj_train, te_pairs,
                            split.test_labels[:80], h=1,
                            class_values=split.class_values)
    cfg = IGMCConfig(num_relations=len(split.class_values), num_bases=4)
    params = igmc_init(jax.random.PRNGKey(1), cfg)
    # the jitted train step donates its param buffers; keep a host copy of
    # the untrained params for the ensemble checks below
    params0 = jax.tree_util.tree_map(np.array, params)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    final_rmse, state = train_multiple_epochs(
        tr, te, fwd, params, epochs=2, batch_size=50, lr=1e-3,
        lr_decay_factor=0.1, lr_decay_step_size=50, ARR=0.001,
        test_freq=1, seed=1, progress=False)

    # 1) served scores == the eval pipeline's raw predictions
    from igmc_tpu.batching.dense import plan_dense_buckets
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.train.loop import (dense_predict_all,
                                     make_dense_device_eval_step)

    dd = DeviceDataset(te.packed, 8, 16, 50)
    buckets = plan_dense_buckets(te.node_counts(), te.edge_counts() // 2)
    eval_fns = [make_dense_device_eval_step(fwd, b.node_slot, b.edge_slot)
                for b in buckets]
    want = dense_predict_all(eval_fns, state.params, dd, buckets, 50,
                             len(te))

    pred = Predictor(split.adj_train, split.class_values, cfg,
                     params=state.params)
    got = pred.predict(*te_pairs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # RMSE through the server == RMSE the training loop reported
    ys = split.class_values[split.test_labels[:80]]
    rmse = float(np.sqrt(np.mean((got - ys) ** 2)))
    np.testing.assert_allclose(rmse, final_rmse, rtol=1e-5)

    # 2) checkpoint + ensemble: mean of the two checkpoints' predictions
    c1, c2 = tmp_path / "model_checkpoint1.ckpt", \
        tmp_path / "model_checkpoint2.ckpt"
    save_checkpoint(str(c1), params0)       # untrained
    save_checkpoint(str(c2), state.params)  # trained
    pred_e = Predictor(split.adj_train, split.class_values, cfg,
                       checkpoints=[str(c1), str(c2)])
    got_e = pred_e.predict(*te_pairs)
    p1 = Predictor(split.adj_train, split.class_values, cfg,
                   params=params0).predict(*te_pairs)
    np.testing.assert_allclose(got_e, (p1 + got) / 2.0, rtol=1e-5,
                               atol=1e-5)

    # from_results_dir resolves the CLI checkpoint-range convention
    pred_d = Predictor.from_results_dir(
        str(tmp_path), split.adj_train, split.class_values, cfg,
        epochs=2, interval=1, span=1)
    np.testing.assert_allclose(pred_d.predict(*te_pairs), got_e,
                               rtol=1e-5, atol=1e-5)

    # 3) pinned slot ladder: same scores, shapes restricted to the ladder
    nmax = int(te.node_counts().max())
    emax = int((te.edge_counts() // 2).max())
    ladder = [(-(-nmax // 8) * 8, -(-emax // 8) * 8)]
    pred_l = Predictor(split.adj_train, split.class_values, cfg,
                       params=state.params, slot_ladder=ladder)
    got_l = pred_l.predict(*te_pairs)
    np.testing.assert_allclose(got_l, want, rtol=1e-4, atol=1e-4)
    assert list(pred_l._eval_fns) == [tuple(ladder[0])]

    # a too-small ladder refuses loudly instead of truncating subgraphs
    with pytest.raises(ValueError):
        Predictor(split.adj_train, split.class_values, cfg,
                  params=state.params,
                  slot_ladder=[(8, 8)]).predict(*te_pairs)

    # input validation
    with pytest.raises(ValueError):
        pred.predict([1, 2], [3])
    assert pred.predict([], []).shape == (0,)


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
def test_predictor_dp_mesh_matches_single_device():
    """Serving over a data-parallel mesh (gid block sharded over 'data',
    tables/params replicated) scores identically to single-device."""
    from igmc_tpu.data import load_data_monti
    from igmc_tpu.models import IGMCConfig, igmc_init
    from igmc_tpu.parallel import make_mesh
    from igmc_tpu.serve import Predictor

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    split = load_data_monti("flixster", testing=True)
    cfg = IGMCConfig(num_relations=len(split.class_values), num_bases=4)
    params = igmc_init(jax.random.PRNGKey(3), cfg)
    pairs = (split.test_u_indices[:96], split.test_v_indices[:96])

    single = Predictor(split.adj_train, split.class_values, cfg,
                       params=params, batch_size=48)
    dp = Predictor(split.adj_train, split.class_values, cfg,
                   params=params, batch_size=48, mesh=make_mesh(n_data=8))
    np.testing.assert_allclose(dp.predict(*pairs), single.predict(*pairs),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError):
        Predictor(split.adj_train, split.class_values, cfg, params=params,
                  batch_size=50, mesh=make_mesh(n_data=8))


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
def test_predictor_side_features():
    """cfg.side_features: the serving path plumbs u/v feature matrices
    through extraction/packing identically to the eval pipeline."""
    from igmc_tpu.batching import StaticGraphDataset
    from igmc_tpu.batching.dense import plan_dense_buckets
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.data import load_data_monti
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.serve import Predictor
    from igmc_tpu.train.loop import (dense_predict_all,
                                     make_dense_device_eval_step)

    split = load_data_monti("flixster", testing=True)
    uf = split.u_features.toarray()
    vf = split.v_features.toarray()
    nf = uf.shape[1] + vf.shape[1]
    cfg = IGMCConfig(num_relations=len(split.class_values), num_bases=4,
                     side_features=True, n_side_features=nf)
    params = igmc_init(jax.random.PRNGKey(5), cfg)
    pairs = (split.test_u_indices[:60], split.test_v_indices[:60])

    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    te = StaticGraphDataset(None, split.adj_train, pairs,
                            split.test_labels[:60], h=1,
                            class_values=split.class_values,
                            u_features=uf, v_features=vf)
    dd = DeviceDataset(te.packed, 8, 16, 30)
    buckets = plan_dense_buckets(te.node_counts(), te.edge_counts() // 2)
    eval_fns = [make_dense_device_eval_step(fwd, b.node_slot, b.edge_slot)
                for b in buckets]
    want = dense_predict_all(eval_fns, params, dd, buckets, 30, len(te))

    pred = Predictor(split.adj_train, split.class_values, cfg,
                     params=params, u_features=uf, v_features=vf,
                     batch_size=30)
    got = pred.predict(*pairs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
@pytest.mark.slow
def test_predict_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """Train a debug run through the main CLI, then score pairs through the
    serving CLI (python -m igmc_tpu.cli.predict): in-range finite ratings,
    one output line per input pair."""
    from igmc_tpu.cli.main import main as train_main
    from igmc_tpu.cli.predict import main as predict_main
    from igmc_tpu.data import load_data_monti

    monkeypatch.chdir(tmp_path)
    train_main(["--data-name", "flixster", "--testing", "--debug",
                "--epochs", "2", "--save-interval", "1",
                "--max-train-num", "120", "--max-test-num", "40"])

    split = load_data_monti("flixster", testing=True)
    pairs = tmp_path / "pairs.csv"
    with open(pairs, "w") as f:
        for u, v in zip(split.test_u_indices[:25], split.test_v_indices[:25]):
            f.write(f"{u},{v}\n")
    out = tmp_path / "preds.csv"
    predict_main(["--data-name", "flixster", "--testing",
                  "--results-dir", "results/flixster_testmode",
                  "--epochs", "2", "--pairs", str(pairs),
                  "--out", str(out), "--batch-size", "25"])
    rows = [l.split(",") for l in out.read_text().strip().splitlines()]
    assert len(rows) == 25
    scores = np.array([float(r[2]) for r in rows])
    assert np.isfinite(scores).all()
    assert (np.array([int(r[0]) for r in rows])
            == split.test_u_indices[:25]).all()


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
@pytest.mark.slow
def test_predict_cli_transfer_serving(tmp_path, monkeypatch):
    """Transfer serving: a douban-trained model (5 relations) scores
    flixster pairs through the serving CLI with --transfer bucketing
    flixster's 10 half-star classes into the source's 5 relations."""
    from igmc_tpu.cli.main import main as train_main
    from igmc_tpu.cli.predict import main as predict_main
    from igmc_tpu.data import load_data_monti

    monkeypatch.chdir(tmp_path)
    train_main(["--data-name", "douban", "--testing", "--debug",
                "--epochs", "1", "--save-interval", "1",
                "--max-train-num", "120", "--max-test-num", "40"])

    split = load_data_monti("flixster", testing=True)
    pairs = tmp_path / "pairs.csv"
    with open(pairs, "w") as f:
        for u, v in zip(split.test_u_indices[:20], split.test_v_indices[:20]):
            f.write(f"{u},{v}\n")
    out = tmp_path / "preds.csv"
    predict_main(["--data-name", "flixster", "--testing",
                  "--results-dir", "results/douban_testmode",
                  "--epochs", "1", "--transfer", "--num-relations", "5",
                  "--multiply-by", "1", "--pairs", str(pairs),
                  "--out", str(out), "--batch-size", "20"])
    scores = np.array([float(l.split(",")[2])
                       for l in out.read_text().strip().splitlines()])
    assert scores.shape == (20,) and np.isfinite(scores).all()

    with pytest.raises(SystemExit):
        predict_main(["--data-name", "flixster", "--testing",
                      "--results-dir", "results/douban_testmode",
                      "--epochs", "1", "--transfer",
                      "--pairs", str(pairs)])


def test_predictor_cold_start_pairs():
    """Cold-start pairs (user/item with NO observed ratings -> zero-edge
    enclosing subgraph) must serve finite scores, not crash — a production
    edge case the training pipeline never sees."""
    import scipy.sparse as sp

    from igmc_tpu.models import IGMCConfig, igmc_init
    from igmc_tpu.serve import Predictor

    rng = np.random.default_rng(0)
    M = sp.random(50, 50, density=0.1, format="csr",
                  random_state=np.random.RandomState(1))
    M.data = rng.integers(1, 6, M.nnz).astype(np.float64)
    M = M.tolil()
    M[7, :] = 0   # cold user
    M[:, 9] = 0   # cold item
    M = M.tocsr()
    M.eliminate_zeros()

    cfg = IGMCConfig(num_relations=5, num_bases=4)
    pred = Predictor(M, np.arange(1.0, 6.0), cfg,
                     params=igmc_init(jax.random.PRNGKey(0), cfg),
                     batch_size=8)
    us, vs = M.nonzero()
    out = pred.predict([7, 7, int(us[0])], [9, int(vs[0]), 9])
    assert out.shape == (3,) and np.isfinite(out).all()


def test_predictor_rejects_out_of_range_pairs():
    import scipy.sparse as sp

    from igmc_tpu.models import IGMCConfig, igmc_init
    from igmc_tpu.serve import Predictor

    M = sp.random(20, 30, density=0.2, format="csr",
                  random_state=np.random.RandomState(2))
    M.data = (M.data * 4 + 1).astype(np.float64)
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    pred = Predictor(M, np.arange(1.0, 6.0), cfg,
                     params=igmc_init(jax.random.PRNGKey(0), cfg))
    with pytest.raises(ValueError, match="out of range"):
        pred.predict([0, 20], [0, 0])   # user 20 >= 20
    with pytest.raises(ValueError, match="out of range"):
        pred.predict([0], [30])         # item 30 >= 30
    with pytest.raises(ValueError, match="out of range"):
        pred.predict([-1], [0])


def test_pad_packed_high_water_caps():
    """_cap/_pad_packed invariants: padded table shapes come from the
    geometric ladder, are MONOTONE across calls via the caps dict (the
    serving shape-stability fix), and padding never changes real data."""
    import scipy.sparse as sp

    from igmc_tpu.batching import StaticGraphDataset
    from igmc_tpu.serve import _cap, _pad_packed

    assert _cap(1) == 256 and _cap(256) == 256
    assert _cap(257) > 256 and _cap(257) % 256 == 0
    big = _cap(100_000)
    assert big >= 100_000 and (big - 100_000) / 100_000 < 0.13
    # monotone in n
    vals = [_cap(n) for n in range(1, 5000, 37)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))

    rng = np.random.default_rng(0)
    M = sp.random(40, 40, density=0.15, format="csr",
                  random_state=np.random.RandomState(3))
    M.data = rng.integers(1, 6, M.nnz).astype(np.float64)
    us, vs = M.nonzero()
    ds1 = StaticGraphDataset(None, M, (us[:20], vs[:20]),
                             np.zeros(20, np.int64), h=1,
                             class_values=np.arange(1.0, 6.0))
    caps = {}
    p1 = _pad_packed(ds1.packed, caps)
    caps1 = dict(caps)
    assert len(p1.node_label) == caps["N"]
    assert len(p1.num_u) == caps["G"]
    assert len(p1.node_offsets) == caps["G"] + 1
    # real prefix preserved, offsets repeat into the padding
    np.testing.assert_array_equal(
        p1.node_label[:len(ds1.packed.node_label)], ds1.packed.node_label)
    assert (p1.node_offsets[len(ds1.packed.node_offsets):]
            == ds1.packed.node_offsets[-1]).all()

    ds2 = StaticGraphDataset(None, M, (us[:30], vs[:30]),
                             np.zeros(30, np.int64), h=1,
                             class_values=np.arange(1.0, 6.0))
    _pad_packed(ds2.packed, caps)
    assert all(caps[k] >= caps1[k] for k in caps1)  # high-water: never shrink
    _pad_packed(ds1.packed, caps)
    caps3 = dict(caps)
    _pad_packed(ds2.packed, caps)
    assert caps == caps3  # stable: repeats mint no new shapes


def test_read_pairs_formats(tmp_path):
    """The pairs parser accepts comma/tab/space separators, skips blanks,
    comments, and one header row, and names the offending line on bad
    input (round-4 review finding)."""
    from igmc_tpu.cli.predict import read_pairs

    f = tmp_path / "pairs.csv"
    f.write_text("user,item\n# comment\n1,2\n3\t4\n5 6\n\n7, 8\n")
    us, vs = read_pairs(str(f))
    np.testing.assert_array_equal(us, [1, 3, 5, 7])
    np.testing.assert_array_equal(vs, [2, 4, 6, 8])

    bad = tmp_path / "bad.csv"
    bad.write_text("1,2\nnot-a-pair\n")
    with pytest.raises(SystemExit, match="bad.csv:2"):
        read_pairs(str(bad))

    short = tmp_path / "short.csv"
    short.write_text("1,2\n3\n")
    with pytest.raises(SystemExit, match="short.csv:2"):
        read_pairs(str(short))

    empty = tmp_path / "empty.csv"
    empty.write_text("# nothing\n")
    with pytest.raises(SystemExit, match="no \\(user, item\\) pairs"):
        read_pairs(str(empty))
