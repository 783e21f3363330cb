"""Child process for the 2-process jax.distributed test.

Run as:  python tests/_distributed_child.py <coordinator> <process_id>

Each process owns 4 virtual CPU devices (8 global), builds the SAME
deterministic 8-graph dataset, feeds only its process_shard_indices shard
through global_batch_from_local, and runs one data-parallel train step over
the global mesh — the full multi-host recipe of igmc_tpu/parallel/multihost.py
across a real process boundary. Prints one JSON line with the loss.

The graph-construction helper lives at module level (numpy-only) so the
parent test can import it for the single-process reference without touching
jax's platform config.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def make_graphs(n=8, seed=0):
    import numpy as np
    import scipy.sparse as sp

    from igmc_tpu.graphs import BipartiteCSR, extract_many

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


def build_local_stack(graphs, indices):
    from igmc_tpu.batching import collate
    from igmc_tpu.parallel import stack_batches

    subs = [collate([graphs[int(i)]], 1, 64, 256) for i in indices]
    return stack_batches(subs)


def main():
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.parallel import (batch_sharding, global_batch_from_local,
                                   make_dp_train_step, make_mesh,
                                   process_shard_indices, replicated_sharding)
    from igmc_tpu.train.loop import make_optimizer

    graphs = make_graphs()
    idx = process_shard_indices(len(graphs))     # this process's 4 indices
    local = build_local_stack(graphs, idx)

    mesh = make_mesh(n_data=8)
    batch = global_batch_from_local(local, mesh)

    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training=False)
    opt = make_optimizer(1e-3)
    pshd = replicated_sharding(mesh)

    def rep(x):
        # replicate host values onto the global (multi-process) mesh
        return jax.make_array_from_process_local_data(pshd, np.asarray(x))

    p = jax.tree_util.tree_map(rep, params)
    s = jax.tree_util.tree_map(rep, opt.init(params))
    step = make_dp_train_step(fwd, opt, 0.001, mesh, batch_sharding(mesh),
                              pshd)
    p, s, loss, n = step(p, s, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    # params after the update, fingerprinted for cross-process comparison
    fp = float(sum(jnp_abs_sum(l) for l in jax.tree_util.tree_leaves(p)))
    print(json.dumps({"pid": pid, "loss": float(loss), "n": float(n),
                      "param_fingerprint": fp}))


def jnp_abs_sum(leaf):
    import jax.numpy as jnp

    return jnp.sum(jnp.abs(leaf))


if __name__ == "__main__":
    main()
