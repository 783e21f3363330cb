"""Profile the blocked HBM-resident R-GCN aggregate on the real chip.

Captures a jax.profiler trace of K chained _fwd_scan layers at the
bench.py hbm_resident_r5 shape, plus microbenchmarks that isolate each
stage of the scan body (gather / message matmul / one-hot indicator
matmul / chunk reduction) so the trace's hot op can be attributed.

Usage: python scripts/profile_blocked.py [--trace-dir /tmp/blocked_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from igmc_tpu.ops.blocked import (BlockedEdges, blocked_rgcn_aggregate,
                                  plan_blocked_edges)

N, E, R, C, NB_BASES = 262144, 2097152, 5, 32, 4


def make_inputs(rows, eblk, group, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    et = rng.integers(0, R, E).astype(np.int32)
    mask = (np.arange(E) < int(E * 0.9)).astype(np.float32)
    canon = np.arange(E, dtype=np.int32)
    blocked = plan_blocked_edges(src, dst, et, mask, canon, N, rows=rows,
                                 eblk=eblk, group=group)
    x = jnp.asarray(rng.standard_normal((N, C), np.float32))
    att = jnp.asarray(rng.standard_normal((R, NB_BASES), np.float32))
    basis = jnp.asarray(
        rng.standard_normal((NB_BASES, C, C), np.float32) * 0.1)
    return blocked, x, att, basis


def timeit(fn, *args, iters=8):
    """bench.py's timing discipline, not bare block_until_ready: the
    tunneled backend acks small output buffers before execution, so only a
    VALUE FETCH hard-syncs; and each round times `iters` vs `4*iters`
    dispatches and differences so RTT/launch overheads cancel. Falls back
    to the whole-run upper bound if noise makes the difference non-positive
    (round-3 ADVICE item 4)."""
    out = fn(*args)
    float(np.asarray(out).sum())  # compile + hard sync (value fetch)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        float(np.asarray(o).sum())  # hard sync: fetch waits for execution
        return time.perf_counter() - t0, o

    from bench import best_positive

    samples = []
    for _ in range(3):
        t_lo, _ = run(iters)
        t_hi, out = run(4 * iters)
        samples.append(((t_hi - t_lo) / (3 * iters), t_hi / (4 * iters)))
    return best_positive(samples), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--rows", type=int, default=256)
    p.add_argument("--eblk", type=int, default=1024)
    p.add_argument("--group", type=int, default=8)
    args = p.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    blocked, x, att, basis = make_inputs(args.rows, args.eblk, args.group)
    masks = (blocked.fwd.mask, blocked.bwd.mask)

    @jax.jit
    def layer(x):
        return blocked_rgcn_aggregate(x, att, basis, blocked, masks,
                                      blocked.rows, N, blocked.group)

    t, _ = timeit(layer, x)
    print(f"full layer ({args.rows}r/{args.eblk}e/g{args.group}): "
          f"{t*1e3:.2f} ms  -> {0.9*E/t/1e6:.1f} M real edges/s", flush=True)

    # --- stage isolation (same shapes as one scan step, repeated) ---
    plan = blocked.fwd
    NB = plan.gather.shape[0]
    G = blocked.group
    shp = (NB // G, G, args.eblk)
    gth = plan.gather.reshape(shp)
    rowi = plan.row.reshape(shp)
    eti = plan.etype.reshape(shp)
    mi = plan.mask.reshape(shp)
    bflat = basis.reshape(NB_BASES * C, C)

    @jax.jit
    def stage_gather(x):
        def body(_, s):
            return None, x[s].sum(axis=(0, 1))
        _, out = jax.lax.scan(body, None, gth)
        return out

    @jax.jit
    def stage_msg(x):
        def body(_, inp):
            s, t, m = inp
            xs = x[s]
            ae = att[t] * m[..., None]
            z = (ae[..., None] * xs[..., None, :]).reshape(
                G, args.eblk, NB_BASES * C)
            msg = z @ bflat
            return None, msg.sum(axis=(0, 1))
        _, out = jax.lax.scan(body, None, (gth, eti, mi))
        return out

    @jax.jit
    def stage_full_body(x):
        def body(_, inp):
            s, d, t, m = inp
            xs = x[s]
            ae = att[t] * m[..., None]
            z = (ae[..., None] * xs[..., None, :]).reshape(
                G, args.eblk, NB_BASES * C)
            msg = z @ bflat
            oh = jax.nn.one_hot(d, args.rows, dtype=msg.dtype)
            part = jnp.einsum("ger,gec->grc", oh, msg,
                              preferred_element_type=jnp.float32)
            return None, part.sum(axis=0)
        _, out = jax.lax.scan(body, None, (gth, rowi, eti, mi))
        return out

    for name, fn in [("gather only", stage_gather),
                     ("gather+msg matmul", stage_msg),
                     ("full body (no chunk-sum)", stage_full_body)]:
        t, _ = timeit(fn, x)
        print(f"  {name:28s}: {t*1e3:.2f} ms", flush=True)

    if args.trace_dir:
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            for _ in range(4):
                out = layer(x)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace_dir}", flush=True)


if __name__ == "__main__":
    main()
