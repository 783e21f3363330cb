#!/bin/bash
# Multi-seed harness: run IGMC five times (seeds 1..5) on Flixster, Douban or
# YahooMusic, then summarize with scripts/summarize_fdy.py.
# Parity with /root/reference/run_fdy.sh. Usage: scripts/run_fdy.sh DATANAME
set -e

data=${1:?usage: run_fdy.sh flixster|douban|yahoo_music}
for i in $(seq 1 5); do
  python -m igmc_tpu.cli.main --data-name "${data}" --save-appendix "_s${i}" \
    --hop 1 --epochs 40 --testing --seed "${i}" --ensemble
done
