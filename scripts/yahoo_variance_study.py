"""Yahoo R=71 seed-variance study under DEFAULT (mean) aggregation.

Round-4 judge finding: yahoo_music under the repo-default `--aggr mean`
lands at 19.24±0.22 over 5 seeds (paper 19.12), with seed scatter 10x
douban's. This harness runs 5 seeds at each of several one-knob variants
(LR-decay inside the run, stronger ARR, more bases) to either tighten the
band or show the scatter is irreducible at R=71.

Usage: python scripts/yahoo_variance_study.py [--results-root results]
       [--configs baseline decay20 arr2 bases8] [--seeds 1 2 3 4 5]
Prints one JSON line per config and a final summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # r04 baseline re-run (reference defaults): the control arm
    "baseline": [],
    # decay the LR 0.1x at epoch 20 (the reference's step-50 schedule never
    # fires inside a 40-epoch run -> full-LR jitter at the end)
    "decay20": ["--lr-decay-step-size", "20"],
    # stronger adjacent-rating regularization: R=71 has 70 adjacent pairs
    "arr2": ["--ARR", "0.002"],
    # more basis vectors for the 71-relation decomposition
    "bases8": ["--num-bases", "8"],
}


def run_one(config: str, extra, seed: int, results_root: str) -> float:
    from igmc_tpu.cli.main import main

    appendix = f"_vs_{config}_s{seed}"
    log = os.path.join(results_root, f"yahoo_music{appendix}_testmode",
                       "log.txt")
    if not os.path.isfile(log):
        main(["--data-name", "yahoo_music", "--testing", "--ensemble",
              "--hop", "1", "--epochs", "40", "--seed", str(seed),
              "--save-appendix", appendix] + list(extra))
    with open(log) as f:
        lines = f.readlines()
    # ensemble line is last; fall back to final epoch rmse
    return float(lines[-1].split(" ")[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results-root", default="results")
    p.add_argument("--configs", nargs="+", default=list(CONFIGS))
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    args = p.parse_args()

    summary = {}
    for config in args.configs:
        extra = CONFIGS[config]
        rmses = []
        for seed in args.seeds:
            r = run_one(config, extra, seed, args.results_root)
            rmses.append(r)
            print(json.dumps({"config": config, "seed": seed,
                              "ensemble_rmse": r}), flush=True)
        arr = np.asarray(rmses)
        summary[config] = {"mean": round(float(arr.mean()), 4),
                           "std": round(float(arr.std()), 4),
                           "min": round(float(arr.min()), 4),
                           "max": round(float(arr.max()), 4),
                           "rmses": [round(float(x), 4) for x in arr]}
        print(json.dumps({config: summary[config]}), flush=True)
    print(json.dumps({"metric": "yahoo_variance_study", "paper": 19.12,
                      **summary}), flush=True)


if __name__ == "__main__":
    main()
