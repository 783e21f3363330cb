"""Native C++ extraction engine: parity with the NumPy reference path."""

import numpy as np
import pytest
import scipy.sparse as sp

from igmc_tpu.graphs import BipartiteCSR, extract_many
from igmc_tpu.graphs import native


def graph_fixture(nu=120, nv=150, density=0.08, seed=2):
    rng = np.random.default_rng(seed)
    M = (rng.random((nu, nv)) < density).astype(np.float32) * rng.integers(
        1, 6, (nu, nv)
    ).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    return A, us, vs, labels, np.arange(1.0, 6.0)


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native engine not built")


@needs_native
def test_native_matches_numpy_unsampled_h1():
    A, us, vs, labels, cv = graph_fixture()
    links = (us, vs)
    a = extract_many(links, labels, A, h=1, class_values=cv, backend="numpy")
    b = extract_many(links, labels, A, h=1, class_values=cv, backend="native")
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.node_label, y.node_label)
        np.testing.assert_array_equal(x.src, y.src)
        np.testing.assert_array_equal(x.dst, y.dst)
        np.testing.assert_array_equal(x.etype, y.etype)
        assert x.num_u == y.num_u and x.y == y.y


@needs_native
def test_native_matches_numpy_h2():
    A, us, vs, labels, cv = graph_fixture(nu=50, nv=50, density=0.05)
    n = min(60, len(us))
    a = extract_many((us[:n], vs[:n]), labels[:n], A, h=2, class_values=cv,
                     backend="numpy")
    b = extract_many((us[:n], vs[:n]), labels[:n], A, h=2, class_values=cv,
                     backend="native")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.node_label, y.node_label)
        np.testing.assert_array_equal(x.src, y.src)
        np.testing.assert_array_equal(x.etype, y.etype)


@needs_native
def test_native_sampling_deterministic_and_capped():
    A, us, vs, labels, cv = graph_fixture(density=0.3)
    n = 40
    links = (us[:n], vs[:n])
    g1 = extract_many(links, labels[:n], A, h=1, max_nodes_per_hop=4,
                      class_values=cv, seed=9, backend="native")
    g2 = extract_many(links, labels[:n], A, h=1, max_nodes_per_hop=4,
                      class_values=cv, seed=9, backend="native")
    for x, y in zip(g1, g2):
        np.testing.assert_array_equal(x.src, y.src)
        np.testing.assert_array_equal(x.node_label, y.node_label)
        assert x.num_u <= 5 and x.num_v <= 5
    g3 = extract_many(links, labels[:n], A, h=1, max_nodes_per_hop=4,
                      class_values=cv, seed=10, backend="native")
    # Different seed -> different sampled nodes -> different induced edges.
    # (node_label alone is insensitive: it's only the hop/side pattern.)
    assert any(
        len(x.etype) != len(y.etype) or not np.array_equal(x.etype, y.etype)
        for x, y in zip(g1, g3)
    )


@needs_native
def test_native_side_features_passthrough():
    A, us, vs, labels, cv = graph_fixture()
    uf = np.random.default_rng(0).normal(size=(A.num_users, 3)).astype(np.float32)
    vf = np.random.default_rng(1).normal(size=(A.num_items, 2)).astype(np.float32)
    g = extract_many((us[:5], vs[:5]), labels[:5], A, h=1, u_features=uf,
                     v_features=vf, class_values=cv, backend="native")
    for i, x in enumerate(g):
        np.testing.assert_array_equal(x.u_feat, uf[us[i]])
        np.testing.assert_array_equal(x.v_feat, vf[vs[i]])


def test_abi_guard_rejects_versionless_lib():
    """A library object without the version symbol (stale pre-versioning
    binary) must be rejected by the ABI check."""
    from igmc_tpu.graphs import native

    class StaleLib:
        def __getattr__(self, name):
            raise AttributeError(name)

    assert native._abi_ok(StaleLib()) is False
    if native.available():
        assert native._abi_ok(native._load()) is True
