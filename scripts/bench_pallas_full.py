"""Full-model XLA vs Pallas measurement (the kernels/README.md table).

Times the complete 4-layer IGMC model — forward, and forward+backward
(grad w.r.t. every parameter) — with the R-GCN aggregate running either as

  * the default XLA strategy (`conv_strategy` auto: flat-index dispatch),or
  * the fused Pallas kernel (`IGMCConfig.use_pallas`, block-aligned edges,
    custom_vjp backward) — kernels/rgcn_aggregate.py,

at two or more flat-layout shapes, on the real device. Timing follows
bench.py's chained-scan discipline (one jit of K serialized iterations,
call-count differencing) because single-dispatch wall-clocks lie through
the tunneled backend.

Usage: python scripts/bench_pallas_full.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root (bench.py, __graft_entry__)


def make_chained_grad(cfg, K: int, aligned=None, aligned_t=None):
    """ONE jit of K serialized fwd+bwd passes: iteration k's gradient sum
    perturbs every parameter of iteration k+1 (x1e-30) so no layer can be
    hoisted; the carry chains calls (same discipline as
    bench.make_chained_forward)."""
    import jax
    import jax.numpy as jnp

    from igmc_tpu.models import igmc_forward

    def loss(p, batch):
        if aligned_t is not None:
            import dataclasses

            batch = dataclasses.replace(batch, aligned_t=aligned_t)
        preds = igmc_forward(p, batch, cfg, key=None, training=False,
                             aligned=aligned)
        return jnp.sum(preds ** 2)

    gfn = jax.grad(loss)

    @jax.jit
    def chained(params, batch, c0):
        def body(c, _):
            p2 = jax.tree_util.tree_map(lambda a: a + c, params)
            g = gfn(p2, batch)
            s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
            return s * 1e-30, None

        c, _ = jax.lax.scan(body, c0, None, length=K)
        return c

    return chained


def bench_one(node_pad: int, edge_pad: int, batch_graphs: int,
              num_relations: int, K: int = 32, calls: int = 3,
              rows: int = 256) -> dict:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from bench import make_chained_forward, time_chained
    from igmc_tpu.kernels import block_align_edges
    from igmc_tpu.models import IGMCConfig, igmc_init

    batch = _synthetic_batch(num_graphs=batch_graphs, node_pad=node_pad,
                             edge_pad=edge_pad, num_relations=num_relations)
    n_real = int(np.asarray(batch.edge_mask).sum())

    t0 = time.perf_counter()
    al = block_align_edges(
        np.asarray(batch.edge_src), np.asarray(batch.edge_dst),
        np.asarray(batch.edge_type), np.asarray(batch.edge_mask),
        node_pad, eblk=1024, rows=rows)
    align_ms = (time.perf_counter() - t0) * 1e3
    aligned = jax.device_put(tuple(jnp.asarray(a) for a in al[:6]))

    from igmc_tpu.kernels.rgcn_aggregate import block_align_edges_transposed

    alt = block_align_edges_transposed(
        np.asarray(batch.edge_src), np.asarray(batch.edge_dst),
        np.asarray(batch.edge_type), np.asarray(batch.edge_mask),
        node_pad, eblk=1024, rows=rows)
    aligned_t = jax.device_put(tuple(jnp.asarray(a) for a in alt[:6]))

    name = f"N{node_pad}_E{edge_pad}_R{num_relations}"
    out = {f"{name}_real_edges": n_real,
           f"{name}_align_host_ms": round(align_ms, 1)}

    cfg_x = IGMCConfig(num_relations=num_relations, num_bases=4,
                       adj_dropout=0.0)
    cfg_p = IGMCConfig(num_relations=num_relations, num_bases=4,
                       adj_dropout=0.0, use_pallas=True, pallas_rows=rows)
    params = jax.device_put(igmc_init(jax.random.PRNGKey(0), cfg_x))
    batch = jax.device_put(batch)

    for tag, cfg, alg, alt_ in (("xla", cfg_x, None, None),
                                ("pallas", cfg_p, aligned, None),
                                ("pallas_train", cfg_p, aligned, aligned_t)):
        if alt_ is None:
            fwd = make_chained_forward(cfg, K, aligned=alg)
            dt = time_chained(fwd, params, batch, K, calls)
            out[f"{name}_{tag}_forward_ms"] = round(dt * 1e3, 4)
        bwd = make_chained_grad(cfg, K, aligned=alg, aligned_t=alt_)
        dtb = time_chained(bwd, params, batch, K, calls)
        out[f"{name}_{tag}_fwdbwd_ms"] = round(dtb * 1e3, 4)

    out[f"{name}_forward_speedup_pallas"] = round(
        out[f"{name}_xla_forward_ms"] / out[f"{name}_pallas_forward_ms"], 3)
    out[f"{name}_fwdbwd_speedup_pallas"] = round(
        out[f"{name}_xla_fwdbwd_ms"] / out[f"{name}_pallas_fwdbwd_ms"], 3)
    out[f"{name}_fwdbwd_speedup_pallas_train"] = round(
        out[f"{name}_xla_fwdbwd_ms"]
        / out[f"{name}_pallas_train_fwdbwd_ms"], 3)
    return out


def main():
    import jax

    dev = jax.devices()[0]
    results = {"device": str(dev.device_kind)}
    # The bench.py r5 shape and a 4x-smaller one; R=10 covers flixster.
    results.update(bench_one(8192, 65536, 128, 5))
    results.update(bench_one(2048, 16384, 32, 5, K=64, calls=4))
    results.update(bench_one(8192, 65536, 128, 10))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
