"""Reference (.pth) checkpoint interoperability (train/torch_interop.py).

The reference saves torch ``state_dict``s (/root/reference/Main.py:43) and
its transfer/ensemble workflows reload them (Main.py:424,469). These tests
pin the bidirectional conversion: key names and tensor layouts match the
reference's registration exactly, values survive a round trip bit-for-bit,
and the CLI-facing surfaces (load_checkpoint dispatch, resolve_checkpoint,
ensemble) consume real ``.pth`` files."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from igmc_tpu.models import (DGCNNConfig, IGMCConfig, dgcnn_forward,
                             dgcnn_init, igmc_forward, igmc_init)
from igmc_tpu.train import (load_checkpoint, params_from_state_dict,
                            resolve_checkpoint, save_checkpoint,
                            save_reference_checkpoint,
                            state_dict_from_params)
from igmc_tpu.train.torch_interop import load_reference_checkpoint

torch = pytest.importorskip("torch")


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_igmc_state_dict_names_and_layouts():
    """Key names and shapes must match what the reference's IGMC registers
    (convs.{i}.{basis,att,root,bias}, lin1/lin2 with torch's [out, in]
    Linear layout — /root/reference/models.py:170-190)."""
    cfg = IGMCConfig(num_relations=5, num_bases=2)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    sd = state_dict_from_params(params)

    expected = set()
    for i in range(4):
        expected |= {f"convs.{i}.{k}" for k in ("basis", "att", "root",
                                                "bias")}
    expected |= {"lin1.weight", "lin1.bias", "lin2.weight", "lin2.bias"}
    assert set(sd) == expected

    assert tuple(sd["convs.0.basis"].shape) == (2, cfg.num_features, 32)
    assert tuple(sd["convs.0.att"].shape) == (5, 2)
    assert tuple(sd["convs.0.root"].shape) == (cfg.num_features, 32)
    # torch Linear stores [out_features, in_features]
    assert tuple(sd["lin1.weight"].shape) == (128, 2 * sum(cfg.latent_dim))
    assert tuple(sd["lin2.weight"].shape) == (1, 128)
    # the transpose must be a layout change, not a value change
    np.testing.assert_array_equal(
        sd["lin1.weight"].numpy().T, np.asarray(params["lin1"]["weight"]))


def test_igmc_round_trip_exact():
    cfg = IGMCConfig(num_relations=7, num_bases=4)
    params = igmc_init(jax.random.PRNGKey(1), cfg)
    template = igmc_init(jax.random.PRNGKey(2), cfg)
    back = params_from_state_dict(state_dict_from_params(params), template)
    _tree_equal(params, back)


def test_dgcnn_rs_round_trip_exact():
    """DGCNN_RS covers the conv1d heads and the relational trunk
    (reference names conv1d_params1/2 — /root/reference/models.py:80-82)."""
    cfg = DGCNNConfig(relational=True, num_relations=5, num_bases=2, k=12)
    params = dgcnn_init(jax.random.PRNGKey(3), cfg)
    sd = state_dict_from_params(params)
    assert "conv1d_params1.weight" in sd and "conv1d_params2.bias" in sd
    assert tuple(sd["conv1d_params1.weight"].shape) == (
        16, 1, cfg.total_latent_dim)
    template = dgcnn_init(jax.random.PRNGKey(4), cfg)
    _tree_equal(params, params_from_state_dict(sd, template))


def test_pth_file_round_trip_and_forward_equality(tmp_path):
    """Save .pth with torch.save, reload through the converter, and verify
    the model predicts identically — the actual transfer use case."""
    from igmc_tpu.batching import StaticGraphDataset
    import scipy.sparse as sp

    cfg = IGMCConfig(num_relations=5, num_bases=2)
    params = igmc_init(jax.random.PRNGKey(5), cfg)
    path = str(tmp_path / "model_checkpoint40.pth")
    save_reference_checkpoint(path, params)
    loaded = load_reference_checkpoint(
        path, igmc_init(jax.random.PRNGKey(6), cfg))
    _tree_equal(params, loaded)

    rng = np.random.default_rng(0)
    M = (rng.random((20, 20)) < 0.4) * rng.integers(1, 6, (20, 20))
    A = sp.csr_matrix(M.astype(np.float32))
    us, vs = np.nonzero(M)
    ds = StaticGraphDataset(None, A, (us[:16], vs[:16]),
                            (M[us, vs][:16] - 1).astype(np.int64), h=1,
                            class_values=np.arange(1.0, 6.0),
                            backend="numpy")
    from igmc_tpu.batching import collate
    batch = collate([ds.get(i) for i in range(8)], num_graphs=8,
                    node_pad=256, edge_pad=2048)
    p1 = igmc_forward(params, batch, cfg)
    p2 = igmc_forward(loaded, batch, cfg)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_load_checkpoint_dispatches_on_pth(tmp_path):
    cfg = IGMCConfig()
    params = igmc_init(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path / "model_checkpoint10.pth")
    save_reference_checkpoint(path, params)
    _tree_equal(params, load_checkpoint(
        path, igmc_init(jax.random.PRNGKey(8), cfg)))


def test_resolve_checkpoint_prefers_native_falls_back_to_pth(tmp_path):
    cfg = IGMCConfig()
    params = igmc_init(jax.random.PRNGKey(9), cfg)
    d = str(tmp_path)
    save_reference_checkpoint(f"{d}/model_checkpoint20.pth", params)
    assert resolve_checkpoint(d, "model", 20).endswith(".pth")
    save_checkpoint(f"{d}/model_checkpoint20.ckpt", params)
    assert resolve_checkpoint(d, "model", 20).endswith(".ckpt")
    # neither exists -> native path, so callers' missing-file errors hold
    assert resolve_checkpoint(d, "model", 99).endswith(".ckpt")


def test_shape_mismatch_and_missing_keys_raise(tmp_path):
    cfg5 = IGMCConfig(num_relations=5)
    cfg7 = IGMCConfig(num_relations=7)
    sd = state_dict_from_params(igmc_init(jax.random.PRNGKey(10), cfg5))
    with pytest.raises(ValueError, match="convs.0.att"):
        params_from_state_dict(sd, igmc_init(jax.random.PRNGKey(11), cfg7))
    sd.pop("lin1.bias")
    with pytest.raises(KeyError, match="lin1.bias"):
        params_from_state_dict(sd, igmc_init(jax.random.PRNGKey(12), cfg5))


def test_unexpected_keys_raise():
    cfg = IGMCConfig()
    sd = state_dict_from_params(igmc_init(jax.random.PRNGKey(13), cfg))
    sd["convs.4.root"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="unexpected"):
        params_from_state_dict(sd, igmc_init(jax.random.PRNGKey(14), cfg))
