"""Child process for the 2-process DENSE-DP jax.distributed test.

Run as:  python tests/_distributed_dense_child.py <coordinator> <process_id>

Each process owns 4 virtual CPU devices (8 global). Both build the SAME
deterministic packed dataset, replicate the packed tables over the global
mesh, shard the [K, B] gid block's graph axis across processes, and run one
dense device-resident DP train step (train/loop.py
make_dense_device_train_step) — the flagship static-dataset path across a
real process boundary (round-2 VERDICT weak #6). Prints one JSON line.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tests._distributed_child import make_graphs  # noqa: E402  (numpy-only)


def main():
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 8

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from igmc_tpu.batching.dataset import _PackedGraphs
    from igmc_tpu.batching.dense import plan_dense_buckets
    from igmc_tpu.batching.device_data import DeviceDataset
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.parallel import make_mesh, replicated_sharding
    from igmc_tpu.train.loop import (make_dense_device_train_step,
                                     make_optimizer)

    mesh = make_mesh(n_data=8)
    pshd = replicated_sharding(mesh)
    blk_shd = NamedSharding(mesh, P(None, "data"))

    def rep(x):
        return jax.make_array_from_process_local_data(pshd, np.asarray(x))

    graphs = make_graphs()
    packed = _PackedGraphs(graphs)
    dd = DeviceDataset(packed, 8, 16, 8)
    bucket = plan_dense_buckets(dd.node_counts(), dd.edge_counts() // 2,
                                max_buckets=1)[0]
    dd = jax.tree_util.tree_map(rep, dd)  # replicate tables globally

    cfg = IGMCConfig(num_relations=5, num_bases=2, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)
    opt = make_optimizer(1e-3)
    step = make_dense_device_train_step(fwd, opt, bucket.node_slot,
                                        bucket.edge_slot, ARR=0.001,
                                        mesh=mesh)
    p = jax.tree_util.tree_map(rep, params)
    s = jax.tree_util.tree_map(rep, opt.init(params))

    # global gid block [1, 8], graph axis sharded: this process feeds its
    # 4 columns
    blk = np.arange(8, dtype=np.int32).reshape(1, 8)
    local_cols = blk[:, pid * 4:(pid + 1) * 4]
    blk_g = jax.make_array_from_process_local_data(blk_shd, local_cols)

    p, s, total, n = step(p, s, rep(np.zeros((), np.float32)), dd, blk_g,
                          jax.random.PRNGKey(0), rep(np.int32(0)))
    jax.block_until_ready(total)
    fp = float(sum(jnp.sum(jnp.abs(l))
                   for l in jax.tree_util.tree_leaves(p)))
    print(json.dumps({"pid": pid, "loss_sum": float(total),
                      "n": float(n), "param_fingerprint": fp}))


if __name__ == "__main__":
    main()
