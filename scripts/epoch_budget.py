"""Where does a douban dense epoch's wall-clock go? (round-2 VERDICT item 9)

Decomposes the steady-state epoch of the flagship dense device-resident
training path (the configuration of the PARITY.md douban quality runs:
`--data-name douban --testing --aggr sum`, dense buckets, superbatch) into

  * train-dispatch time (epochs run with eval disabled),
  * eval time (the difference when test_freq=1),
  * host/dispatch overhead sensitivity (sweep the superbatch factor — the
    scan length per dispatch; pure dispatch-granularity knob, numerics
    identical),

and captures ONE jax.profiler trace of a steady epoch whose device-busy
time is extracted from the xplane protobuf (tensorboard_plugin_profile),
so wall - device_busy = host + tunnel attribution is measured, not guessed.

Timing source: per-epoch deltas of the `logger` callback, which
train_multiple_epochs invokes after each epoch's single host sync. The
first epoch compiles every per-bucket program; steady state = epochs >= 3.

Usage: python scripts/epoch_budget.py [--data-name douban] [--epochs 8]
       [--out results_archive/epoch_budget_r04]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(data_name: str, seed: int = 1):
    from igmc_tpu.cli.main import (build_datasets, build_model, build_parser,
                                   load_split, rating_maps)

    args = build_parser().parse_args(
        ["--data-name", data_name, "--testing", "--aggr", "sum",
         "--seed", str(seed)])
    rating_map, post_rating_map = rating_maps(args)
    split = load_split(args, rating_map, post_rating_map)
    train_g, _, test_g, nf = build_datasets(args, split)
    fwd, params, cfg = build_model(args, split, nf, train_g)
    return args, train_g, test_g, fwd, params


def run_epochs(train_g, test_g, fwd, params, epochs: int, superbatch: int,
               test_freq: int, seed: int = 1, profile_dir=None):
    """One training run; returns per-epoch wall-clock seconds (logger deltas)."""
    import jax

    from igmc_tpu.train import train_multiple_epochs

    marks = [time.perf_counter()]

    def logger(info, state):
        marks.append(time.perf_counter())

    params0 = jax.tree_util.tree_map(np.array, params)  # fresh copy per run
    train_multiple_epochs(
        train_g, test_g, fwd, params0, epochs=epochs, batch_size=50,
        lr=1e-3, lr_decay_factor=0.1, lr_decay_step_size=50,
        ARR=0.001, test_freq=test_freq, logger=logger, seed=seed,
        progress=False, profile_dir=profile_dir, superbatch=superbatch,
        batch_mode="dense")
    return np.diff(np.asarray(marks))


def trace_device_busy_ms(profile_dir: str):
    """Device-busy time and per-module totals straight from the xplane
    protobuf (the tensorboard_plugin_profile converter is incompatible with
    the installed TF, so read the trace's '/device:TPU:0' plane directly:
    the 'XLA Modules' line's events are the non-overlapping module
    executions — their total duration IS the device busy time)."""
    paths = glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None, "no xplane.pb found"
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:
        return None, f"xplane proto unavailable: {e}"
    try:
        import collections

        xs = xplane_pb2.XSpace()
        with open(paths[0], "rb") as f:
            xs.ParseFromString(f.read())
        dev = [pl for pl in xs.planes
               if pl.name.startswith("/device:") and pl.lines]
        if not dev:
            return None, "no device plane"
        dev = dev[0]
        meta = {m.id: m.name for m in dev.event_metadata.values()}
        out = {}
        for ln in dev.lines:
            if ln.name != "XLA Modules":
                continue
            mods = collections.Counter()
            cnt = collections.Counter()
            for e in ln.events:
                mods[meta[e.metadata_id]] += e.duration_ps / 1e9
                cnt[meta[e.metadata_id]] += 1
            out["device_busy_ms"] = round(sum(mods.values()), 2)
            out["modules"] = [
                {"name": k, "total_ms": round(v, 1), "count": cnt[k]}
                for k, v in mods.most_common(10)]
        return (out, None) if out else (None, "no XLA Modules line")
    except Exception as e:
        return None, f"{type(e).__name__}: {e}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-name", default="douban")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--out", default="results_archive/epoch_budget_r04")
    args = p.parse_args()

    import jax

    # Persistent compilation cache: the sweep re-traces identical programs
    # per configuration; only steady-state epochs are reported, so caching
    # compiles does not distort the measurement.
    jax.config.update("jax_compilation_cache_dir", "/tmp/igmc_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    os.makedirs(args.out, exist_ok=True)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    _, train_g, test_g, fwd, params = build(args.data_name)
    n_train, n_test = len(train_g), len(test_g)
    print(f"{args.data_name}: {n_train} train / {n_test} test subgraphs",
          flush=True)

    out = {"device": str(dev.device_kind), "data_name": args.data_name,
           "n_train": n_train, "n_test": n_test, "batch_size": 50}

    # --- superbatch sweep, eval every epoch vs never ---
    for sb in (8, 32, 128):
        for tf_label, tfreq in (("eval1", 1), ("noeval", 10**6)):
            t = run_epochs(train_g, test_g, fwd, params, args.epochs, sb,
                           tfreq)
            steady = t[2:]
            key = f"sb{sb}_{tf_label}"
            out[f"{key}_first_epoch_s"] = round(float(t[0]), 3)
            out[f"{key}_steady_epoch_s"] = round(float(np.median(steady)), 3)
            print(f"{key}: first={t[0]:.2f}s "
                  f"steady={np.median(steady):.3f}s (n={len(steady)})",
                  flush=True)

    for sb in (8, 32, 128):
        tr = out[f"sb{sb}_noeval_steady_epoch_s"]
        ev = out[f"sb{sb}_eval1_steady_epoch_s"] - tr
        out[f"sb{sb}_eval_s"] = round(ev, 3)
        print(f"sb{sb}: train {tr:.3f}s + eval {ev:.3f}s", flush=True)

    # --- one steady-epoch trace (best superbatch, eval on) ---
    trace_dir = os.path.join(args.out, "trace")
    t = run_epochs(train_g, test_g, fwd, params, 3, 32, 1,
                   profile_dir=trace_dir)
    out["traced_epoch_s"] = round(float(t[1]), 3)  # epoch 2 is traced
    busy, err = trace_device_busy_ms(trace_dir)
    if busy:
        out.update(busy)
        out["host_tunnel_ms"] = round(
            t[1] * 1e3 - busy["device_busy_ms"], 2)
    else:
        out["trace_parse_error"] = err
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(args.out, "epoch_budget.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
