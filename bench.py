"""Benchmark: R-GCN aggregate throughput (edges/sec/chip) on the real device.

The north-star metric from BASELINE.json: edges/sec/chip on the R-GCN
aggregate (gather -> per-relation transform -> scatter-mean), the hot kernel
of IGMC's forward (/root/reference/models.py:200-202). The reference has no
machine-readable baseline (BASELINE.json published: {}), so `vs_baseline`
reports the fraction of the HBM-bandwidth roofline achieved on this chip —
BASELINE.json's own target is >= 80% of SpMM roofline (vs_baseline >= 0.8).

Roofline model (v5e, ~819 GB/s HBM): the aggregate is memory-bound IF every
edge round-trips HBM. Per directed edge that minimum traffic is:
  gather 4*C bytes of source features + scatter-accumulate 2*4*C bytes
  (read+write) + 3 int32 indices = 12 bytes        (C = feature width, 32)
  => ~396 bytes/edge  =>  HBM roofline ~2.07e9 edges/s.
vs_baseline > 1.0 means the kernel beats the HBM-residency bound: the padded
batch fits in VMEM, so XLA keeps the layer pipeline on-chip (the point of
static-shape bucketing) and the flattened-index gather (models/rgcn.py)
runs at VMEM bandwidth.
"""

from __future__ import annotations

import json
import time

import numpy as np


def hbm_bandwidth_bytes_per_sec(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819e9
    if "v5p" in kind or "v5" in kind:
        return 2765e9
    if "v4" in kind:
        return 1228e9
    if "v6" in kind or "trillium" in kind:
        return 1640e9
    return 819e9  # conservative default


def bench_extraction(n_links: int = 30000) -> dict:
    """Host-side subgraph extraction throughput (the second north-star
    metric: subgraphs/sec; reference is ~3.3k/s on 8 cores per README:13)."""
    import scipy.sparse as sp

    from igmc_tpu.graphs import BipartiteCSR, extract_many

    rng = np.random.default_rng(0)
    n_side = 3000
    density = 0.01  # ~90k ratings, Monti-dataset scale
    M = sp.random(n_side, n_side, density=density, format="csr",
                  random_state=np.random.RandomState(0))
    M.data = rng.integers(1, 6, M.nnz).astype(np.float64)
    A = BipartiteCSR(M)
    us, vs = M.nonzero()
    labels = (M.data - 1).astype(np.int64)
    n = min(n_links, len(labels))
    cv = np.arange(1.0, 6.0)
    from igmc_tpu.graphs import native

    out = {}
    backends = ["numpy"] + (["native"] if native.available() else [])
    for backend in backends:
        m = n if backend == "native" else min(n, 3000)
        t0 = time.perf_counter()
        extract_many((us[:m], vs[:m]), labels[:m], A, h=1, class_values=cv,
                     backend=backend)
        out[f"extraction_{backend}_subgraphs_per_sec"] = round(
            m / (time.perf_counter() - t0), 1)
    if not native.available():
        out["extraction_native_subgraphs_per_sec"] = None  # engine not built
    return out


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from igmc_tpu.models import IGMCConfig, igmc_forward, igmc_init
    from igmc_tpu.train.loop import make_optimizer, make_train_step

    dev = jax.devices()[0]
    C = 32
    NODE_PAD, EDGE_PAD, B = 8192, 65536, 128
    cfg = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0)
    params = igmc_init(jax.random.PRNGKey(0), cfg)
    batch = _synthetic_batch(num_graphs=B, node_pad=NODE_PAD,
                             edge_pad=EDGE_PAD, num_relations=5)
    batch = jax.device_put(batch)
    params = jax.device_put(params)

    fwd = lambda p, b, key=None, training=False: igmc_forward(
        p, b, cfg, key, training)

    # Forward pass over the 4-layer trunk: 4 * EDGE_PAD edge-aggregations.
    f = jax.jit(lambda p, b: fwd(p, b))
    out = f(params, batch)
    jax.block_until_ready(out)
    n_iter = 100
    dt = float("inf")
    for _ in range(3):  # best-of-3 to reject tunnel/dispatch noise
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = f(params, batch)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / n_iter)
    edges_processed = 4 * EDGE_PAD  # 4 R-GCN layers per forward
    eps = edges_processed / dt

    # optional bf16 trunk (same model, compute_dtype="bfloat16")
    cfg16 = IGMCConfig(num_relations=5, num_bases=4, adj_dropout=0.0,
                       compute_dtype="bfloat16")
    f16 = jax.jit(lambda p, b: igmc_forward(p, b, cfg16, None, False))
    out = f16(params, batch)
    jax.block_until_ready(out)
    dt16 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = f16(params, batch)
        jax.block_until_ready(out)
        dt16 = min(dt16, (time.perf_counter() - t0) / n_iter)

    # Full training step (fwd + bwd + Adam + ARR) on the same batch:
    # graphs/sec through the optimizer, the end-to-end device number.
    opt = make_optimizer(1e-3)
    step = make_train_step(fwd, opt, ARR=0.001)
    opt_state = jax.device_put(opt.init(params))
    key = jax.random.PRNGKey(0)
    p2, s2, loss, n = step(params, opt_state, batch, key)
    jax.block_until_ready(loss)
    dts = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p3, s3 = p2, s2
        for _ in range(20):
            p3, s3, loss, n = step(p3, s3, batch, key)
        jax.block_until_ready(loss)
        dts = min(dts, (time.perf_counter() - t0) / 20)
    train_graphs_per_sec = B / dts
    train_edges_per_sec = 4 * EDGE_PAD / dts

    bw = hbm_bandwidth_bytes_per_sec(dev)
    bytes_per_edge = 4 * C + 2 * 4 * C + 12
    roofline = bw / bytes_per_edge

    result = {
        "metric": "rgcn_aggregate_edges_per_sec_per_chip",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / roofline, 4),
        "detail": {
            "device": str(dev.device_kind),
            "forward_ms": round(dt * 1e3, 3),
            "node_pad": NODE_PAD, "edge_pad": EDGE_PAD, "batch_graphs": B,
            "layers": 4, "feature_width": C,
            "roofline_edges_per_sec": round(roofline, 1),
            "baseline_semantics": "fraction of HBM roofline (target >= 0.8)",
            "bf16_trunk_edges_per_sec": round(edges_processed / dt16, 1),
            "train_step_ms": round(dts * 1e3, 3),
            "train_graphs_per_sec": round(train_graphs_per_sec, 1),
            "train_edges_per_sec": round(train_edges_per_sec, 1),
            **bench_extraction(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
