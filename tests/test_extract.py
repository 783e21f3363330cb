"""Extraction/labeling unit tests against hand-computed golden subgraphs."""

import numpy as np
import scipy.sparse as sp

from igmc_tpu.graphs import BipartiteCSR, extract_subgraph, extract_many


def tiny_matrix():
    # users x items, values = rating label + 1 (0 = no rating)
    #        i0 i1 i2 i3
    #   u0 [  2  0  1  0 ]
    #   u1 [  0  3  1  0 ]
    #   u2 [  1  0  0  2 ]
    M = np.array(
        [
            [2, 0, 1, 0],
            [0, 3, 1, 0],
            [1, 0, 0, 2],
        ],
        dtype=np.float32,
    )
    return sp.csr_matrix(M)


def test_one_hop_enclosing_subgraph():
    A = BipartiteCSR(tiny_matrix())
    class_values = np.array([1.0, 2.0, 3.0])
    # Target link (u0, i0). 1-hop:
    #   users reaching i0: u2 (u0 is visited) -> u-fringe {u2}
    #   items reached from u0: i2 (i0 visited) -> v-fringe {i2}
    g = extract_subgraph(0, 0, A, h=1, class_values=class_values, label=1)
    assert g.num_u == 2 and g.num_v == 2
    # node order: [u0, u2, i0, i2]; labels [0, 2, 1, 3]
    np.testing.assert_array_equal(g.node_label, [0, 2, 1, 3])
    # edges in A[u_nodes][:, v_nodes] minus target (u0,i0):
    #   u0-i2 (label 0), u2-i0 (label 0)
    edges = set(zip(g.src.tolist(), g.dst.tolist(), g.etype.tolist()))
    assert edges == {(0, 3, 0), (1, 2, 0)}
    assert g.y == 2.0  # class_values[1]


def test_target_edge_removed():
    A = BipartiteCSR(tiny_matrix())
    g = extract_subgraph(0, 0, A, h=1, class_values=np.array([1.0, 2.0, 3.0]))
    # No edge may connect local node 0 (target user) to target item (num_u).
    for s, d in zip(g.src, g.dst):
        assert not (s == 0 and d == g.num_u)


def test_two_hop_labels():
    A = BipartiteCSR(tiny_matrix())
    g = extract_subgraph(0, 0, A, h=2, class_values=np.array([1.0, 2.0, 3.0]))
    # hop-2: from u-fringe {u2} -> items {i3}; from v-fringe {i2} -> users {u1}
    assert g.num_u == 3 and g.num_v == 3
    np.testing.assert_array_equal(np.sort(g.node_label[: g.num_u]), [0, 2, 4])
    np.testing.assert_array_equal(np.sort(g.node_label[g.num_u :]), [1, 3, 5])


def test_max_nodes_per_hop_caps_fringe():
    rng = np.random.default_rng(0)
    M = (rng.random((30, 40)) < 0.4).astype(np.float32) * rng.integers(
        1, 6, (30, 40)
    ).astype(np.float32)
    M[0, 0] = 1.0
    A = BipartiteCSR(sp.csr_matrix(M))
    g = extract_subgraph(0, 0, A, h=1, max_nodes_per_hop=3,
                         class_values=np.arange(1.0, 6.0))
    assert g.num_u <= 4 and g.num_v <= 4  # target + <=3 per side


def test_extract_many_deterministic():
    rng = np.random.default_rng(1)
    M = (rng.random((20, 20)) < 0.5).astype(np.float32) * rng.integers(
        1, 4, (20, 20)
    ).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    links = (us[:10], vs[:10])
    cv = np.arange(1.0, 4.0)
    g1 = extract_many(links, labels[:10], A, h=1, max_nodes_per_hop=5,
                      class_values=cv, seed=7, backend="numpy")
    g2 = extract_many(links, labels[:10], A, h=1, max_nodes_per_hop=5,
                      class_values=cv, seed=7, backend="numpy")
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(a.src, b.src)
        np.testing.assert_array_equal(a.node_label, b.node_label)


def test_empty_fringe_stops():
    # Isolated link: u only rates v, v only rated by u.
    M = np.zeros((3, 3), dtype=np.float32)
    M[1, 1] = 2.0
    A = BipartiteCSR(sp.csr_matrix(M))
    g = extract_subgraph(1, 1, A, h=3, class_values=np.array([1.0, 2.0]))
    assert g.num_u == 1 and g.num_v == 1
    assert len(g.src) == 0  # the only edge was the target edge, removed
