"""R-GCN layer parity vs. a dense NumPy oracle + gradient checks."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from igmc_tpu.models.rgcn import (
    rgcn_init, rgcn_apply, rgcn_relation_weights, gcn_init, gcn_apply,
)


def dense_rgcn_oracle(params, x, src, dst, etype, emask, num_nodes):
    """Reference math: mean over incoming edges of x[src] @ W_r, + root + bias."""
    att = np.asarray(params["att"])
    basis = np.asarray(params["basis"])
    R, B = att.shape
    _, ci, co = basis.shape
    w = (att @ basis.reshape(B, -1)).reshape(R, ci, co)
    out = np.zeros((num_nodes, co), dtype=np.float64)
    cnt = np.zeros(num_nodes, dtype=np.float64)
    for e in range(len(src)):
        if not emask[e]:
            continue
        out[dst[e]] += np.asarray(x)[src[e]] @ w[etype[e]]
        cnt[dst[e]] += 1
    out = out / np.maximum(cnt, 1)[:, None]
    out = out + np.asarray(x) @ np.asarray(params["root"]) + np.asarray(params["bias"])
    return out


def random_graph(num_nodes=11, num_edges=40, R=5, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    dst = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    etype = rng.integers(0, R, num_edges).astype(np.int32)
    emask = rng.random(num_edges) < 0.8
    x = rng.normal(size=(num_nodes, 4)).astype(np.float32)
    return x, src, dst, etype, emask


@pytest.mark.slow
def test_rgcn_matches_dense_oracle_both_strategies():
    R = 5
    x, src, dst, etype, emask = random_graph(R=R)
    params = rgcn_init(jax.random.PRNGKey(0), 4, 8, R, 3)
    want = dense_rgcn_oracle(params, x, src, dst, etype, emask, 11)
    for strategy in ("dispatch", "per-edge"):
        got = rgcn_apply(params, jnp.asarray(x), jnp.asarray(src),
                         jnp.asarray(dst), jnp.asarray(etype),
                         jnp.asarray(emask), 11, strategy)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_rgcn_many_relations():
    # yahoo_music has 71 relations; both strategies must agree.
    R = 71
    x, src, dst, etype, emask = random_graph(num_edges=100, R=R, seed=3)
    params = rgcn_init(jax.random.PRNGKey(1), 4, 8, R, 4)
    a = rgcn_apply(params, jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
                   jnp.asarray(etype), jnp.asarray(emask), 11, "dispatch")
    b = rgcn_apply(params, jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
                   jnp.asarray(etype), jnp.asarray(emask), 11, "per-edge")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_rgcn_padding_does_not_pollute():
    R = 3
    x, src, dst, etype, emask = random_graph(num_nodes=6, num_edges=10, R=R)
    params = rgcn_init(jax.random.PRNGKey(2), 4, 8, R, 2)
    out1 = rgcn_apply(params, jnp.asarray(x), jnp.asarray(src),
                      jnp.asarray(dst), jnp.asarray(etype),
                      jnp.asarray(emask), 6)
    # append masked padding edges pointing at node 0
    pad = 16
    src2 = np.concatenate([src, np.zeros(pad, np.int32)])
    dst2 = np.concatenate([dst, np.zeros(pad, np.int32)])
    et2 = np.concatenate([etype, np.zeros(pad, np.int32)])
    em2 = np.concatenate([emask, np.zeros(pad, bool)])
    out2 = rgcn_apply(params, jnp.asarray(x), jnp.asarray(src2),
                      jnp.asarray(dst2), jnp.asarray(et2),
                      jnp.asarray(em2), 6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_rgcn_grad_finite_differences():
    R = 3
    x, src, dst, etype, emask = random_graph(num_nodes=6, num_edges=12, R=R)
    params = rgcn_init(jax.random.PRNGKey(4), 4, 4, R, 2)

    def loss(p):
        out = rgcn_apply(p, jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
                         jnp.asarray(etype), jnp.asarray(emask), 6)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    eps = 1e-3
    for name in ("basis", "att", "root", "bias"):
        flat = np.asarray(params[name]).ravel()
        idx = 0
        p_plus = {k: np.array(v) for k, v in params.items()}
        p_minus = {k: np.array(v) for k, v in params.items()}
        p_plus[name].ravel()[idx] += eps
        p_minus[name].ravel()[idx] -= eps
        fd = (float(loss(p_plus)) - float(loss(p_minus))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[name]).ravel()[idx], fd,
                                   rtol=2e-2, atol=2e-3)


def test_gcn_symmetric_norm():
    # path graph 0-1-2 undirected
    src = np.array([0, 1, 1, 2], np.int32)
    dst = np.array([1, 0, 2, 1], np.int32)
    emask = np.ones(4, bool)
    nmask = np.ones(3, bool)
    x = np.eye(3, dtype=np.float32)
    params = gcn_init(jax.random.PRNGKey(0), 3, 3)
    params = {"weight": jnp.eye(3), "bias": jnp.zeros(3)}
    out = np.asarray(gcn_apply(params, jnp.asarray(x), jnp.asarray(src),
                               jnp.asarray(dst), jnp.asarray(emask),
                               jnp.asarray(nmask), 3))
    # deg+selfloop: node0=2, node1=3, node2=2
    d = np.array([2.0, 3.0, 2.0])
    A = np.array([[1, 1, 0], [1, 1, 1], [0, 1, 1]], dtype=np.float64)
    want = (A / np.sqrt(np.outer(d, d))) @ np.eye(3)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_rgcn_aggr_variants():
    """'sum' and 'relmean' aggregation vs a dense NumPy oracle."""
    import numpy as np
    from igmc_tpu.models.rgcn import rgcn_apply, rgcn_init, rgcn_relation_weights

    rng = np.random.default_rng(3)
    N, E, R = 12, 40, 3
    x = jnp.asarray(rng.standard_normal((N, 5)), jnp.float32)
    src = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    et = jnp.asarray(rng.integers(0, R, E), jnp.int32)
    mask = jnp.asarray(rng.random(E) < 0.8)
    params = rgcn_init(jax.random.PRNGKey(0), 5, 7, R, 2)
    w = np.asarray(rgcn_relation_weights(params))

    msg = np.einsum("ei,eio->eo", np.asarray(x)[np.asarray(src)],
                    w[np.asarray(et)]) * np.asarray(mask)[:, None]
    base = np.asarray(x) @ np.asarray(params["root"]) + np.asarray(params["bias"])

    # sum
    want = base.copy()
    np.add.at(want, np.asarray(dst), msg)
    got = rgcn_apply(params, x, src, dst, et, mask, N, "dispatch", "sum")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # relmean
    want = base.copy()
    for n in range(N):
        for r in range(R):
            sel = (np.asarray(dst) == n) & (np.asarray(et) == r) & np.asarray(mask)
            if sel.any():
                want[n] += msg[sel].sum(0) / sel.sum()
    got = rgcn_apply(params, x, src, dst, et, mask, N, "dispatch", "relmean")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
