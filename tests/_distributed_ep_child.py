"""Child process for the 2-process jax.distributed EP test.

Run as:  python tests/_distributed_ep_child.py <coordinator> <process_id>

Each process owns 4 virtual CPU devices (8 global), builds the SAME
deterministic 16-graph collated batch, runs the deterministic edge
partitioner for the full 8-way mesh, and feeds ONLY its 4 local partitions
through jax.make_array_from_process_local_data. The EP train step's
per-layer halo all_to_all then crosses a REAL process boundary — the
correctness evidence for multi-host EP that the single-process virtual-mesh
tests cannot give. Prints one JSON line with loss / n / param fingerprint.

Graph construction mirrors tests/test_ep.py::make_batch at module level so
the parent can import it for the single-process reference.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def make_batch(n_graphs=16, node_pad=512, edge_pad=4096, seed=0):
    import numpy as np
    import scipy.sparse as sp

    from igmc_tpu.batching import collate
    from igmc_tpu.graphs import BipartiteCSR, extract_many

    rng = np.random.default_rng(seed)
    M = (rng.random((40, 40)) < 0.35).astype(np.float32) * rng.integers(
        1, 6, (40, 40)
    ).astype(np.float32)
    A = BipartiteCSR(sp.csr_matrix(M))
    us, vs = np.nonzero(M)
    labels = (M[us, vs] - 1).astype(np.int64)
    cv = np.arange(1.0, 6.0)
    graphs = extract_many((us[:n_graphs], vs[:n_graphs]), labels[:n_graphs],
                          A, h=1, class_values=cv, backend="numpy")
    return collate(graphs, n_graphs, node_pad, edge_pad)


def main():
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from igmc_tpu.models import IGMCConfig, igmc_init
    from igmc_tpu.parallel import make_mesh
    from igmc_tpu.parallel.ep import make_ep_train_step, partition_batch
    from igmc_tpu.train.loop import make_optimizer

    mesh = make_mesh(n_data=8)
    shd = NamedSharding(mesh, P("data"))
    rshd = NamedSharding(mesh, P())

    # deterministic full partition on every host; feed only the local rows
    ep_full = partition_batch(make_batch(), 8)
    lo, hi = pid * 4, (pid + 1) * 4

    def put(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(
            shd, np.asarray(x)[lo:hi])

    ep = jax.tree_util.tree_map(put, ep_full,
                                is_leaf=lambda x: x is None)

    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)

    def rep(x):
        return jax.make_array_from_process_local_data(rshd, np.asarray(x))

    p = jax.tree_util.tree_map(rep, params)
    s = jax.tree_util.tree_map(rep, opt.init(params))

    step, _, _ = make_ep_train_step(cfg, opt, ARR=0.001, mesh=mesh)
    p, s, loss, n = step(p, s, ep, jnp.uint32(0))
    jax.block_until_ready(loss)
    fp = float(sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(p)))
    print(json.dumps({"pid": pid, "loss": float(loss), "n": float(n),
                      "param_fingerprint": fp}))


if __name__ == "__main__":
    main()
