"""Weak-scaling benchmark: edges/sec vs device count for the DP and EP paths.

BASELINE target: >= 75% edges/s scaling efficiency at 2+ hosts. On real
multi-chip hardware run this unchanged (it uses jax.devices()); without one
it runs on the virtual CPU mesh (JAX_PLATFORMS=cpu plus
--xla_force_host_platform_device_count), which validates the methodology
and the sharded programs, not ICI bandwidth.

Usage: python scripts/bench_scaling.py [--devices 1 2 4 8] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--edges-per-device", type=int, default=16384)
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh backend")
    args = p.parse_args()

    if args.cpu or not os.environ.get("JAX_PLATFORMS"):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_batch
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.parallel import (batch_sharding, make_ep_train_step,
                                   make_dp_train_step, make_mesh,
                                   partition_batch, replicated_sharding)
    from igmc_tpu.train.loop import make_optimizer

    n_avail = len(jax.devices())
    results = {"backend": jax.devices()[0].platform, "dp": {}, "ep": {}}
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.2)
    opt = make_optimizer(1e-3)

    for D in args.devices:
        if D > n_avail:
            continue
        mesh = make_mesh(n_data=D)
        nodes_pd = args.edges_per_device // 8
        graphs_pd = 16

        # --- DP: one sub-batch per device, stacked ---
        fwd = lambda pr, b, key=None, training=False: igmc_forward(
            pr, b, cfg, key, training)
        bshd, pshd = batch_sharding(mesh), replicated_sharding(mesh)
        step = make_dp_train_step(fwd, opt, 0.001, mesh, bshd, pshd)
        params = igmc_init(jax.random.PRNGKey(0), cfg)
        batch = _synthetic_batch(num_graphs=graphs_pd, node_pad=nodes_pd,
                                 edge_pad=args.edges_per_device, stack=D)
        batch = jax.device_put(batch, bshd)
        pr = jax.device_put(params, pshd)
        st = jax.device_put(opt.init(params), pshd)
        key = jax.random.PRNGKey(0)
        pr, st, loss, _ = step(pr, st, batch, key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            pr, st, loss, _ = step(pr, st, batch, key)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        results["dp"][D] = 4 * args.edges_per_device * D / dt  # 4 layers

        # --- EP: one giant batch partitioned across devices ---
        from igmc_tpu.parallel.ep import build_ep_blocked

        ep_step, _, _ = make_ep_train_step(cfg, opt, 0.001, mesh)
        flat = _synthetic_batch(num_graphs=graphs_pd * D,
                                node_pad=nodes_pd * D,
                                edge_pad=args.edges_per_device * D)
        ep_host = partition_batch(flat, D)
        plans = build_ep_blocked(ep_host)
        ep = jax.device_put(ep_host)
        p2 = igmc_init(jax.random.PRNGKey(1), cfg)
        s2 = opt.init(p2)
        p2, s2, l2, _ = ep_step(p2, s2, ep, jnp.uint32(0))
        jax.block_until_ready(l2)
        t0 = time.perf_counter()
        for i in range(args.steps):
            p2, s2, l2, _ = ep_step(p2, s2, ep, jnp.uint32(i))
        jax.block_until_ready(l2)
        dt = (time.perf_counter() - t0) / args.steps
        results["ep"][D] = 4 * args.edges_per_device * D / dt

        # --- EP with the blocked local aggregate (ops/blocked.py) ---
        p3 = igmc_init(jax.random.PRNGKey(2), cfg)
        s3 = opt.init(p3)
        p3, s3, l3, _ = ep_step(p3, s3, ep, jnp.uint32(0), plans)
        jax.block_until_ready(l3)
        t0 = time.perf_counter()
        for i in range(args.steps):
            p3, s3, l3, _ = ep_step(p3, s3, ep, jnp.uint32(i), plans)
        jax.block_until_ready(l3)
        dt = (time.perf_counter() - t0) / args.steps
        results.setdefault("ep_blocked", {})[D] = (
            4 * args.edges_per_device * D / dt)
        # boundary-halo interconnect bytes vs the full all_gather it replaces
        from igmc_tpu.parallel.ep import comm_stats

        results.setdefault("ep_comm", {})[D] = comm_stats(
            ep, feature_width=32, n_layers=4, readout_width=128)

    base_dp = results["dp"].get(1)
    base_ep = results["ep"].get(1)
    base_epb = results.get("ep_blocked", {}).get(1)
    out = {"metric": "weak_scaling_edges_per_sec", "backend": results["backend"]}
    if results["backend"] == "cpu":
        out["caveat"] = (
            "virtual CPU mesh (xla_force_host_platform_device_count): "
            "validates the sharded programs and methodology, NOT ICI "
            "bandwidth — efficiencies here reflect host-core contention, "
            "not TPU interconnect; run unchanged on a real slice for the "
            ">=75%-at-2-hosts north star")
    for mode, base in (("dp", base_dp), ("ep", base_ep),
                       ("ep_blocked", base_epb)):
        if mode not in results:
            continue
        for D, eps in results[mode].items():
            out[f"{mode}_{D}dev_edges_per_sec"] = round(eps, 1)
            if base and D > 1:
                out[f"{mode}_{D}dev_efficiency"] = round(eps / (base * D), 3)
    for D, stats in results.get("ep_comm", {}).items():
        out[f"ep_{D}dev_halo_bytes_per_layer"] = stats["halo_bytes_per_layer"]
        out[f"ep_{D}dev_allgather_bytes_per_layer"] = (
            stats["allgather_bytes_per_layer"])
        out[f"ep_{D}dev_comm_reduction_x"] = stats["reduction_x"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
