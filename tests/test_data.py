"""Data-subsystem tests: rating maps, split invariants, transfer bucketing,
checkpoint resume."""

import os

import numpy as np
import pytest

import jax

from igmc_tpu.cli.main import build_parser, rating_maps
from igmc_tpu.data import load_data_monti

MONTI_AVAILABLE = os.path.isdir("/root/reference/raw_data/flixster") or \
    os.path.isdir("raw_data/flixster")


def parse(argv):
    return build_parser().parse_args(argv)


def test_rating_map_standard_flixster():
    """--standard-rating buckets half-star ratings to 1..5
    (/root/reference/Main.py:153-161)."""
    args = parse(["--data-name", "flixster", "--standard-rating"])
    rmap, pmap = rating_maps(args)
    assert rmap[0.5] == 1 and rmap[1.0] == 1
    assert rmap[4.5] == 5 and rmap[5.0] == 5
    assert pmap is None


def test_rating_map_standard_yahoo():
    args = parse(["--data-name", "yahoo_music", "--standard-rating"])
    rmap, _ = rating_maps(args)
    assert rmap[1] == 1 and rmap[20] == 1
    assert rmap[21] == 2 and rmap[100] == 5


def test_post_rating_map_transfer_arity():
    """Transfer rebuckets target edge types into --num-relations buckets
    (/root/reference/Main.py:162-177)."""
    for name, n_classes in (("flixster", 10), ("yahoo_music", 100),
                            ("douban", 5)):
        args = parse(["--data-name", name, "--transfer", "src/",
                      "--num-relations", "5"])
        _, pmap = rating_maps(args)
        assert len(pmap) == n_classes
        assert set(pmap.values()) == set(range(5))


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
def test_monti_split_invariants():
    s = load_data_monti("flixster", testing=False)
    # class values sorted original ratings
    assert (np.diff(s.class_values) > 0).all()
    assert len(s.class_values) == 10  # flixster half-star scale
    # adjacency stores label+1 (0 = no rating)
    vals = np.unique(s.adj_train.data)
    assert vals.min() >= 1 and vals.max() <= len(s.class_values)
    # no test edge appears in the training adjacency
    A = s.adj_train.tocsr()
    present = np.asarray(
        A[s.test_u_indices, s.test_v_indices]).reshape(-1)
    assert (present == 0).all()
    # val links disjoint from train links
    tr = set(zip(s.train_u_indices.tolist(), s.train_v_indices.tolist()))
    va = set(zip(s.val_u_indices.tolist(), s.val_v_indices.tolist()))
    assert not (tr & va)


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
def test_monti_testmode_folds_val_into_train():
    v = load_data_monti("flixster", testing=False)
    t = load_data_monti("flixster", testing=True)
    assert len(t.train_labels) == len(v.train_labels) + len(v.val_labels)
    # testmode adjacency contains the val edges too
    assert t.adj_train.nnz == v.adj_train.nnz + len(v.val_labels)


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
def test_post_rating_map_rebuckets_adjacency():
    args = parse(["--data-name", "flixster", "--transfer", "src/",
                  "--num-relations", "5"])
    _, pmap = rating_maps(args)
    s = load_data_monti("flixster", testing=True, post_rating_map=pmap)
    vals = np.unique(s.adj_train.data)
    # bucketed edge types: values in 1..5 (bucket+1)
    assert vals.min() >= 1 and vals.max() <= 5
    # labels themselves stay on the original 10-class scale
    assert s.train_labels.max() == 9


def test_resume_shifts_epoch_range(tmp_path):
    """--continue-from reloads params+optimizer and continues the epoch count
    (/root/reference/train_eval.py:56-64)."""
    import scipy.sparse as sp

    from igmc_tpu.graphs import BipartiteCSR, extract_many
    from igmc_tpu.batching import collate
    from igmc_tpu.models import IGMCConfig, igmc_init, igmc_forward
    from igmc_tpu.train import train_multiple_epochs
    from igmc_tpu.train.checkpoints import checkpoint_path
    from igmc_tpu.utils import ResultsDir, make_logger

    rng = np.random.default_rng(0)
    M = (rng.random((30, 30)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (30, 30)).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)

    class DS:
        def __init__(s):
            s.graphs = extract_many((us[:64], vs[:64]), labels[:64], A, h=1,
                                    class_values=cv, backend="numpy")

        def __len__(s):
            return len(s.graphs)

        def get(s, i):
            return s.graphs[i]

        def node_counts(s):
            return np.array([g.num_nodes for g in s.graphs])

        def edge_counts(s):
            return np.array([g.num_edges for g in s.graphs])

    ds = DS()
    cfg = IGMCConfig(num_relations=5, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(1), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)

    class Res:
        path = str(tmp_path)

        def log_line(self, s):
            pass

    logger = make_logger(Res(), save_interval=2)
    train_multiple_epochs(ds, ds, fwd, params, epochs=2, batch_size=16,
                          lr=1e-3, lr_decay_factor=0.1,
                          lr_decay_step_size=50, ARR=0.001, test_freq=1,
                          logger=logger, seed=1, progress=False)
    assert os.path.isfile(checkpoint_path(tmp_path, "model", 2))
    assert os.path.isfile(checkpoint_path(tmp_path, "optimizer", 2))

    # resume from epoch 2 for 2 more epochs
    rmse, state = train_multiple_epochs(
        ds, ds, fwd, params, epochs=4, batch_size=16, lr=1e-3,
        lr_decay_factor=0.1, lr_decay_step_size=50, ARR=0.001, test_freq=1,
        logger=logger, continue_from=2, res_dir=str(tmp_path), seed=1,
        progress=False)
    assert state.epoch == 4
    assert np.isfinite(rmse)


def test_summarize_fdy_parses_results(tmp_path):
    """scripts/summarize_fdy.py consumes the log.txt format — a de-facto
    stable API shared with the reference's summarizer."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "summarize_fdy", os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "summarize_fdy.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for seed, rmse in ((1, 0.88), (2, 0.90), (3, 0.86)):
        d = tmp_path / f"flixster_s{seed}_testmode"
        d.mkdir()
        (d / "log.txt").write_text(
            "Epoch 39, train loss 0.8000, test rmse 0.999999\n"
            f"Epoch ensemble of range(10, 40, 10), train loss 0.0000, "
            f"test rmse {rmse:.6f}\n")
    out = mod.summarize(str(tmp_path), datasets=("flixster",))
    assert np.allclose(sorted(out["flixster"]), [0.86, 0.88, 0.90])


@pytest.mark.skipif(not MONTI_AVAILABLE, reason="Monti raw data not present")
def test_raw_data_dir_per_dataset_fallback(tmp_path, monkeypatch):
    """A local raw_data/ created for ONE dataset (e.g. a MovieLens split
    pickle cache in cwd) must not hide the read-only reference bundles of
    the others (round-4 regression: an ml_1m cache dir broke flixster)."""
    from igmc_tpu.data import load_data_monti, raw_data_dir

    monkeypatch.delenv("IGMC_RAW_DATA", raising=False)
    monkeypatch.chdir(tmp_path)
    (tmp_path / "raw_data" / "ml_1m").mkdir(parents=True)

    assert raw_data_dir("ml_1m") == str(tmp_path / "raw_data")
    assert raw_data_dir("flixster") == "/root/reference/raw_data"
    split = load_data_monti("flixster", testing=True)
    assert len(split.class_values) == 10
