"""Experiment: R-GCN trunk formulations at the HBM-RESIDENT shape.

Round-2 VERDICT weak #1: the flat segment path collapses to 0.8% of the
HBM-streaming roofline at (N=262144, E=2097152, C=32, R=5). This script
measures candidate fixes on the real TPU so the winner can be productized:

  flat_dispatch   current auto path (dispatch table + gather + XLA scatter)
  flat_basismix   basis-mix messages + XLA scatter
  sorted_seg      basis-mix + dst-sorted edges + segment_sum(sorted=True)
  blocked_xla     dst-block-aligned edges (kernels block_align_edges layout),
                  scan over block groups: gather -> basis-mix -> msg matmul ->
                  one-hot indicator matmul per 256-row chunk -> sorted
                  chunk-partial reduction. No scatter anywhere.
  pallas          the existing fused kernel (kernels/rgcn_aggregate.py)

Each variant runs a 4-layer tanh trunk chained K times inside one jit with
a parameter perturbation carry (hoist-proof), timed by call-count
differencing with float() hard syncs (bench.py discipline).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_batch
from igmc_tpu.kernels.rgcn_aggregate import (block_align_edges,
                                             rgcn_aggregate_pallas)
from igmc_tpu.models.rgcn import rgcn_apply, rgcn_init

N, E, B_GRAPHS, R, C = 262144, 2097152, 4096, 5, 32
ROWS, EBLK = 256, 1024
LAYERS = 4


def time_chained(fn, args, K, calls=2, rounds=2):
    c = fn(*args, jnp.float32(0.0))
    float(c)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(calls):
            c = fn(*args, c)
        float(c)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(4 * calls):
            c = fn(*args, c)
        float(c)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (3 * calls * K))
    return best


def trunk_chained(layer_fn, K):
    """4-layer tanh trunk, K serialized reps, param-perturbation carry."""

    @jax.jit
    def chained(params, batch_args, c0):
        def body(c, _):
            p2 = jax.tree_util.tree_map(lambda a: a + c, params)
            x = jnp.zeros((N, C), jnp.float32) + c
            for conv in p2:
                x = jnp.tanh(layer_fn(conv, x, batch_args)
                             + x @ conv["root"] + conv["bias"])
            return jnp.sum(x[:8]) * 1e-30, None

        c, _ = jax.lax.scan(body, c0, None, length=K)
        return c

    return chained


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    batch = _synthetic_batch(num_graphs=B_GRAPHS, node_pad=N, edge_pad=E,
                             num_relations=R)
    n_real = int(batch.edge_mask.sum())
    print(f"real edges: {n_real}", flush=True)

    key = jax.random.PRNGKey(0)
    params = [rgcn_init(k, C, C, R, 4) for k in jax.random.split(key, LAYERS)]
    params = jax.device_put(params)

    src = np.asarray(batch.edge_src)
    dst = np.asarray(batch.edge_dst)
    etype = np.asarray(batch.edge_type)
    emask = np.asarray(batch.edge_mask)

    results = {}

    # --- flat paths ---
    for name, strat, K in [("flat_dispatch", "dispatch", 2),
                           ("flat_basismix", "basis-mix", 2)]:
        d_src, d_dst, d_t, d_m = jax.device_put(
            (src, dst, etype, emask))

        def layer(conv, x, args, _s=strat):
            s, d, t, m = args
            return rgcn_apply(conv, x, s, d, t, m, N, _s, "sum") \
                - x @ conv["root"] - conv["bias"]

        fn = trunk_chained(layer, K)
        dt = time_chained(fn, (params, (d_src, d_dst, d_t, d_m)), K)
        results[name] = dt
        print(f"{name}: {dt * 1e3:.2f} ms "
              f"({LAYERS * n_real / dt / 1e9:.3f} Ge/s)", flush=True)

    # --- sorted segment_sum ---
    order = np.argsort(dst, kind="stable")
    s_src, s_dst = src[order], dst[order]
    s_t, s_m = etype[order], emask[order].astype(np.float32)
    dd = jax.device_put((s_src, s_dst, s_t, s_m))

    def layer_sorted(conv, x, args):
        s, d, t, m = args
        xs = x[s]
        ae = conv["att"][t] * m[:, None]
        nb, cin, cout = conv["basis"].shape
        z = (ae[:, :, None] * xs[:, None, :]).reshape(-1, nb * cin)
        msg = z @ conv["basis"].reshape(nb * cin, cout)
        return jax.ops.segment_sum(msg, d, num_segments=N,
                                   indices_are_sorted=True)

    K = 2
    fn = trunk_chained(layer_sorted, K)
    dt = time_chained(fn, (params, dd), K)
    results["sorted_seg"] = dt
    print(f"sorted_seg: {dt * 1e3:.2f} ms "
          f"({LAYERS * n_real / dt / 1e9:.3f} Ge/s)", flush=True)

    # --- blocked XLA ---
    t0 = time.perf_counter()
    (a_src, a_dstl, a_t, a_m, chunk_of, first_of, n_blocks,
     _ukey) = block_align_edges(src, dst, etype, emask, N, eblk=EBLK,
                                rows=ROWS)
    print(f"block_align_edges: {time.perf_counter() - t0:.2f}s, "
          f"{n_blocks} blocks", flush=True)
    n_chunks = N // ROWS

    for G in (4, 16):
        pad_blocks = -(-n_blocks // G) * G
        if pad_blocks != n_blocks:
            extra = pad_blocks - n_blocks
            a_src2 = np.concatenate([a_src, np.zeros(extra * EBLK, np.int32)])
            a_dstl2 = np.concatenate([a_dstl, np.zeros(extra * EBLK, np.int32)])
            a_t2 = np.concatenate([a_t, np.zeros(extra * EBLK, np.int32)])
            a_m2 = np.concatenate([a_m, np.zeros(extra * EBLK, np.float32)])
            chunk2 = np.concatenate([chunk_of,
                                     np.full(extra, n_chunks - 1, np.int32)])
        else:
            a_src2, a_dstl2, a_t2, a_m2, chunk2 = (a_src, a_dstl, a_t, a_m,
                                                   chunk_of)
        nb_total = pad_blocks
        dd_blk = jax.device_put((
            a_src2.reshape(nb_total // G, G, EBLK),
            a_dstl2.reshape(nb_total // G, G, EBLK),
            a_t2.reshape(nb_total // G, G, EBLK),
            a_m2.reshape(nb_total // G, G, EBLK),
            chunk2.astype(np.int32)))

        def layer_blocked(conv, x, args):
            sb, db, tb, mb, chunk_ids = args
            nb, cin, cout = conv["basis"].shape
            bflat = conv["basis"].reshape(nb * cin, cout)

            def body(_, inp):
                s, d, t, m = inp                       # [G, EBLK]
                xs = x[s]                              # [G, EBLK, cin]
                ae = conv["att"][t] * m[..., None]     # [G, EBLK, nb]
                z = (ae[..., None] * xs[..., None, :]).reshape(
                    G, EBLK, nb * cin)
                msg = z @ bflat                        # [G, EBLK, cout]
                oh = jax.nn.one_hot(d, ROWS, dtype=msg.dtype)
                part = jnp.einsum("ger,gec->grc", oh, msg,
                                  preferred_element_type=jnp.float32)
                return None, part

            _, parts = jax.lax.scan(body, None, (sb, db, tb, mb))
            parts = parts.reshape(-1, ROWS, cout)
            out = jax.ops.segment_sum(parts, chunk_ids,
                                      num_segments=n_chunks,
                                      indices_are_sorted=True)
            return out.reshape(N, cout)

        K = 4
        fn = trunk_chained(layer_blocked, K)
        dt = time_chained(fn, (params, dd_blk), K)
        results[f"blocked_xla_g{G}"] = dt
        print(f"blocked_xla_g{G}: {dt * 1e3:.2f} ms "
              f"({LAYERS * n_real / dt / 1e9:.3f} Ge/s)", flush=True)

    # --- pallas ---
    aligned = jax.device_put((a_src, a_dstl, a_t, a_m, chunk_of, first_of))

    def layer_pallas(conv, x, args):
        return rgcn_aggregate_pallas(x, conv["att"], conv["basis"], args,
                                     ROWS, N)

    K = 4
    fn = trunk_chained(layer_pallas, K)
    dt = time_chained(fn, (params, aligned), K)
    results["pallas"] = dt
    print(f"pallas: {dt * 1e3:.2f} ms "
          f"({LAYERS * n_real / dt / 1e9:.3f} Ge/s)", flush=True)

    bound = 819e9 / (4 * C + 8 * C + 12)
    print("\n=== summary (4-layer trunk, per-layer real-edge rate) ===")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        rate = LAYERS * n_real / v
        print(f"{k:18s} {v * 1e3:9.2f} ms  {rate / 1e9:7.3f} Ge/s  "
              f"{100 * rate / bound:6.1f}% of HBM bound")


if __name__ == "__main__":
    main()
