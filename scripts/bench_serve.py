"""End-to-end serving throughput: (user, item) pairs -> ratings.

Measures igmc_tpu.serve.Predictor on flixster with a trained ensemble:
cold call (includes jit compiles), then steady-state predictions/sec over
repeated batches of fresh pairs (every call re-extracts subgraphs, packs,
uploads and runs the jitted ensemble forward — the full serving path).
A pinned slot ladder keeps every call on the warmed compiled programs.

Usage: python scripts/bench_serve.py [--n 4096] [--rounds 3]
       [--results-dir results/flixster_r4refresh_testmode]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096, help="pairs per call")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--results-dir",
                   default="results/flixster_r4refresh_testmode")
    p.add_argument("--epochs", type=int, default=40,
                   help="checkpoint range anchor (CLI convention)")
    args = p.parse_args()

    import jax

    from igmc_tpu.data import load_data_monti
    from igmc_tpu.models import IGMCConfig
    from igmc_tpu.serve import Predictor

    dev = jax.devices()[0]
    split = load_data_monti("flixster", testing=True)
    cfg = IGMCConfig(num_relations=len(split.class_values), num_bases=4,
                     aggr="sum")

    pred = Predictor.from_results_dir(
        args.results_dir, split.adj_train, split.class_values, cfg,
        epochs=args.epochs, batch_size=128,
        slot_ladder=[(64, 96), (128, 512), (512, 4096)])
    n_ck = len(pred.params_list)
    print(f"device: {dev.device_kind}; ensemble of {n_ck} checkpoints",
          flush=True)

    # pair pool: all test pairs + random observed pairs
    us = np.concatenate([split.test_u_indices, split.train_u_indices])
    vs = np.concatenate([split.test_v_indices, split.train_v_indices])
    rng = np.random.default_rng(0)

    def draw(n):
        idx = rng.integers(0, len(us), n)
        return us[idx], vs[idx]

    t0 = time.perf_counter()
    out = pred.predict(*draw(args.n))
    cold = time.perf_counter() - t0
    print(f"cold call ({args.n} pairs): {cold:.2f}s "
          f"(incl. {len(pred._eval_fns)} compiled shapes)", flush=True)
    assert np.isfinite(out).all()

    rates = []
    for _ in range(args.rounds):
        u, v = draw(args.n)
        t0 = time.perf_counter()
        out = pred.predict(u, v)
        dt = time.perf_counter() - t0
        rates.append(args.n / dt)
        print(f"  {args.n} pairs in {dt*1e3:.0f} ms -> "
              f"{args.n/dt:,.0f} preds/s", flush=True)
    assert np.isfinite(out).all()

    # extraction-only attribution at the same content
    from igmc_tpu.batching import StaticGraphDataset

    u, v = draw(args.n)
    t0 = time.perf_counter()
    StaticGraphDataset(None, split.adj_train, (u, v),
                       np.zeros(args.n, np.int64), h=1,
                       class_values=split.class_values)
    ext = time.perf_counter() - t0

    print(json.dumps({
        "metric": "serving_predictions_per_sec",
        "value": round(float(np.median(rates)), 1),
        "unit": "preds/s",
        "detail": {"device": str(dev.device_kind), "pairs_per_call": args.n,
                   "ensemble_checkpoints": n_ck,
                   "cold_call_s": round(cold, 2),
                   "extraction_only_s_per_call": round(ext, 3)},
    }), flush=True)


if __name__ == "__main__":
    main()
