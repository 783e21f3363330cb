"""Bipartite vs unified dense layout on the chip (round-5 roofline item).

The bipartite slot layout (batching/dense.py DenseBatch.num_u) halves the
one-hot widths of the dense R-GCN trunk — the MAC/VPU work the bf16 dense
path is limited by (BENCH_r04 hbm_resident_vs_bound_bf16 = 0.65). This
harness measures both layouts on IDENTICAL graph content at the headline
bench shapes and prints one JSON line per config plus the achieved/bound
ratios at each dtype.

Run on the real chip: python scripts/bench_bipartite.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    import bench

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "backend": jax.default_backend()}),
          flush=True)

    # numerics cross-check on device first: same graphs, both layouts
    from __graft_entry__ import _synthetic_dense_batch
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init

    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = jax.device_put(igmc_init(jax.random.PRNGKey(0), cfg))
    uni = jax.device_put(_synthetic_dense_batch(num_graphs=32))
    bip = jax.device_put(_synthetic_dense_batch(num_graphs=32,
                                                bipartite=True))
    ou = np.asarray(jax.jit(
        lambda p, b: igmc_forward(p, b, cfg))(params, uni))
    ob = np.asarray(jax.jit(
        lambda p, b: igmc_forward(p, b, cfg))(params, bip))
    err = float(np.abs(ou - ob).max())
    print(json.dumps({"bipartite_vs_unified_max_abs_err": err}), flush=True)
    assert err < 1e-4, "bipartite layout diverged from unified"

    results = {}
    shapes = [
        # (tag, extra kwargs) at the two headline shapes
        ("r5_dense", dict(num_graphs=128, K=64, calls=4, train=True)),
        ("hbm_resident_r5", dict(num_graphs=4096, K=8, calls=2,
                                 train=True, chunk=256)),
    ]
    for tag, kw in shapes:
        for dt_tag, cd in (("bf16", "bfloat16"), ("f32", None)):
            for lay_tag, bi in (("bip", True), ("uni", False)):
                name = f"{tag}_{dt_tag}_{lay_tag}"
                r = bench.bench_dense_shape(
                    name, 5, kw["num_graphs"], 64, 256, dev,
                    K=kw["K"], calls=kw["calls"],
                    train=kw.get("train", False),
                    compute_dtype=cd, chunk=kw.get("chunk", 0),
                    bipartite=bi)
                results.update(r)
                print(json.dumps(r), flush=True)

    # dtype-matched achieved/bound ratios (bench.py convention)
    C = 32
    bound_f32 = bench.hbm_roofline_edges_per_sec(dev, C, 4)
    bound_bf16 = bench.hbm_roofline_edges_per_sec(dev, C, 2)
    summary = {
        "bound_f32": round(bound_f32, 1),
        "bound_bf16": round(bound_bf16, 1),
    }
    for tag in ("r5_dense", "hbm_resident_r5"):
        for lay in ("bip", "uni"):
            kb = f"{tag}_bf16_{lay}_real_edges_per_sec"
            kf = f"{tag}_f32_{lay}_real_edges_per_sec"
            if kb in results:
                summary[f"{tag}_{lay}_vs_bound_bf16"] = round(
                    results[kb] / bound_bf16, 4)
            if kf in results:
                summary[f"{tag}_{lay}_vs_bound_f32"] = round(
                    results[kf] / bound_f32, 4)
        for dt in ("bf16", "f32"):
            kb = f"{tag}_{dt}_bip_real_edges_per_sec"
            ku = f"{tag}_{dt}_uni_real_edges_per_sec"
            if kb in results and ku in results:
                summary[f"{tag}_{dt}_bip_speedup_x"] = round(
                    results[kb] / results[ku], 3)
            tb = f"{tag}_{dt}_bip_train_real_edges_per_sec"
            tu = f"{tag}_{dt}_uni_train_real_edges_per_sec"
            if tb in results and tu in results:
                summary[f"{tag}_{dt}_bip_train_speedup_x"] = round(
                    results[tb] / results[tu], 3)
    print(json.dumps({"metric": "bipartite_study", **summary}), flush=True)


if __name__ == "__main__":
    main()
