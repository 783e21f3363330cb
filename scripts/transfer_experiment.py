"""Transfer experiment end-to-end: ML-100K source -> all three Monti targets.

The reference's run_transfer_exps.sh evaluates an ML-100K-trained model
zero-shot on flixster/douban/yahoo_music with post_rating_map bucketing
(/root/reference/run_transfer_exps.sh:9-25). Real MovieLens needs egress;
this script reproduces the complete experiment offline (round-2 VERDICT
next #8):

  1. generate a synthetic ml_100k in the real file schema
     (igmc_tpu/data/synthetic.py) and train the source model through the
     ordinary CLI (official u1 split, side-feature-free, mnph 200);
  2. EXPORT the source checkpoints to the reference's .pth format
     (train/torch_interop.py) and transfer FROM THE .pth DIRECTORY — the
     interop path a real reference user would exercise;
  3. run scripts/run_transfer_exps.sh for each target; summarize.

Usage: python scripts/transfer_experiment.py [--small] [--epochs N]
  --small: 40x smaller source data + 2 epochs (CPU-friendly smoke).
Writes results under ./results/ and a summary JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true",
                   help="tiny source + 2 epochs (CPU smoke)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--raw-root", default="raw_data_synth")
    p.add_argument("--max-train-num", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars alone are too "
                        "late: a sitecustomize pins the axon platform)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from igmc_tpu.data.synthetic import write_ml100k_format

    if args.small:
        sizes = dict(n_users=120, n_movies=100, n_ratings=2500)
        epochs = args.epochs or 2
    else:
        sizes = dict(n_users=943, n_movies=1682, n_ratings=100_000)
        epochs = args.epochs or 40
    write_ml100k_format(args.raw_root, seed=0, **sizes)
    # IGMC_RAW_DATA redirects EVERY dataset; link the Monti bundles into
    # the synthetic root so the transfer targets still resolve.
    for name in ("flixster", "douban", "yahoo_music"):
        dst = os.path.join(args.raw_root, name)
        if os.path.isdir(dst):
            continue
        for cand in (os.path.join(os.getcwd(), "raw_data", name),
                     f"/root/reference/raw_data/{name}"):
            if os.path.isdir(cand):
                os.symlink(cand, dst)
                break
    os.environ["IGMC_RAW_DATA"] = os.path.abspath(args.raw_root)

    from igmc_tpu.cli.main import main as cli

    # 1) train the source model (official split, testmode, mnph 200 as the
    #    reference's transfer source uses)
    src_args = [
        "--data-name", "ml_100k", "--testing",
        "--epochs", str(epochs), "--batch-size", "50",
        "--max-nodes-per-hop", "200", "--save-appendix", "_mnph200",
        "--save-interval", "10" if epochs >= 10 else "1",
        "--test-freq", str(max(1, epochs // 4)),
    ]
    if args.max_train_num:
        src_args += ["--max-train-num", str(args.max_train_num),
                     "--max-test-num", str(args.max_train_num // 4)]
    cli(src_args)
    src_dir = "results/ml_100k_mnph200_testmode"

    # 2) export the checkpoints to reference .pth format and transfer from
    #    the .pth directory (exercises torch_interop end-to-end)
    import glob
    import re

    from igmc_tpu.models import IGMCConfig, igmc_init
    import jax

    from igmc_tpu.train import load_checkpoint, save_reference_checkpoint

    cfg = IGMCConfig(num_relations=5, num_bases=4)
    template = igmc_init(jax.random.PRNGKey(0), cfg)
    pth_dir = os.path.join(src_dir, "pth_export")
    os.makedirs(pth_dir, exist_ok=True)
    n_exported = 0
    for ck in sorted(glob.glob(os.path.join(src_dir,
                                            "model_checkpoint*.ckpt"))):
        ep = re.search(r"checkpoint(\d+)", ck).group(1)
        params = load_checkpoint(ck, template)
        save_reference_checkpoint(
            os.path.join(pth_dir, f"model_checkpoint{ep}.pth"), params)
        n_exported += 1
    print(f"exported {n_exported} checkpoints to {pth_dir} (.pth)")

    # 3) the three targets, exactly as scripts/run_transfer_exps.sh runs them
    summary = {"source": src_dir, "epochs": epochs,
               "pth_exported": n_exported}
    for data, multiply_by in (("flixster", 1), ("douban", 1),
                              ("yahoo_music", 20)):
        cli([
            "--data-name", data, "--epochs", str(epochs), "--testing",
            "--no-train", "--ensemble", "--transfer", pth_dir,
            "--dynamic-dataset", "--num-relations", "5",
            "--multiply-by", str(multiply_by),
        ] + (["--max-test-num", "500", "--debug"] if args.small else []))
        log = open(f"results/{data}_testmode/log.txt").read()
        rmse = float(log.strip().splitlines()[-1].split(" ")[-1])
        summary[f"{data}_transfer_rmse"] = rmse
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
