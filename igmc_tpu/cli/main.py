"""Experiment driver — flag-compatible with the reference CLI.

Reproduces the argparse surface of /root/reference/Main.py:49-136 (typed
values, no eval()-dispatched class names), the rating_map/post_rating_map
subsystem (:153-177), results-dir management with cmd_input.txt (:183-210),
dataset construction (:296-350), model build (:361-400), training dispatch
(:405-421) and the ensemble / transfer / visualization branches (:423-479).

Known reference quirks intentionally fixed (documented divergences):
  * plain transfer eval used a nonexistent `args.epoch` and crashed
    (/root/reference/Main.py:471) — we report the checkpoint epoch.
  * `--dynamic-dataset` (passed by run_transfer_exps.sh but absent from the
    reference parser) is accepted as an alias for --dynamic-train
    --dynamic-test --dynamic-val.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from shutil import rmtree

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native Inductive Graph-based Matrix Completion"
    )
    # general settings
    p.add_argument("--testing", action="store_true", default=False,
                   help="split all ratings into train/test (no val split)")
    p.add_argument("--no-train", action="store_true", default=False,
                   help="skip training; go straight to transfer/ensemble/visualization")
    p.add_argument("--debug", action="store_true", default=False,
                   help="use a small number of data for debugging")
    p.add_argument("--data-name", default="ml_100k", help="dataset name")
    p.add_argument("--data-appendix", default="",
                   help="appendix to dataset save-names")
    p.add_argument("--save-appendix", default="",
                   help="appendix to result save-names")
    p.add_argument("--max-train-num", type=int, default=None)
    p.add_argument("--max-val-num", type=int, default=None)
    p.add_argument("--max-test-num", type=int, default=None)
    p.add_argument("--seed", type=int, default=1, metavar="S")
    p.add_argument("--data-seed", type=int, default=1234, metavar="S",
                   help="data shuffle seed (ml_1m/ml_10m only)")
    p.add_argument("--reprocess", action="store_true", default=False,
                   help="reprocess data instead of using cached artifacts")
    p.add_argument("--dynamic-train", action="store_true", default=False)
    p.add_argument("--dynamic-test", action="store_true", default=False)
    p.add_argument("--dynamic-val", action="store_true", default=False)
    p.add_argument("--dynamic-dataset", action="store_true", default=False,
                   help="alias: all three --dynamic-* flags")
    p.add_argument("--keep-old", action="store_true", default=False)
    p.add_argument("--save-interval", type=int, default=10)
    # subgraph extraction settings
    p.add_argument("--hop", type=int, default=1)
    p.add_argument("--sample-ratio", type=float, default=1.0)
    p.add_argument("--max-nodes-per-hop", type=int, default=10000)
    p.add_argument("--use-features", action="store_true", default=False)
    # edge dropout settings
    p.add_argument("--adj-dropout", type=float, default=0.2)
    p.add_argument("--force-undirected", action="store_true", default=False)
    # optimization settings
    p.add_argument("--continue-from", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3, metavar="LR")
    p.add_argument("--lr-decay-step-size", type=int, default=50)
    p.add_argument("--lr-decay-factor", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=80, metavar="N")
    p.add_argument("--batch-size", type=int, default=50, metavar="N")
    p.add_argument("--test-freq", type=int, default=1, metavar="N")
    p.add_argument("--ARR", type=float, default=0.001,
                   help="adjacent-rating regularizer weight")
    # transfer / ensemble / visualization
    p.add_argument("--transfer", default="",
                   help="path with pretrained checkpoints to transfer from")
    p.add_argument("--num-relations", type=int, default=5)
    p.add_argument("--multiply-by", type=float, default=1)
    p.add_argument("--visualize", action="store_true", default=False)
    p.add_argument("--ensemble", action="store_true", default=False)
    p.add_argument("--standard-rating", action="store_true", default=False)
    # sparsity experiments
    p.add_argument("--ratio", type=float, default=1.0)
    # TPU-native extensions
    p.add_argument("--model", default="igmc",
                   choices=["igmc", "gnn", "dgcnn", "dgcnn_rs"],
                   help="model family (reference default: IGMC)")
    p.add_argument("--num-bases", type=int, default=4,
                   help="R-GCN basis count (reference hardcodes 4, "
                        "models.py:26; exposed for high-R studies)")
    p.add_argument("--aggr", default="mean", choices=["mean", "sum", "relmean"],
                   help="R-GCN aggregation. 'mean' matches the reference's "
                        "pinned PyG 1.4.2 RGCNConv; 'sum' matches earlier "
                        "PyG (paper-era) and measures closer to the paper's "
                        "RMSE (see PARITY.md)")
    p.add_argument("--n-devices", type=int, default=0,
                   help="data-parallel devices (0 = single device)")
    p.add_argument("--ep-local-aggregate", default="segment",
                   choices=["segment", "blocked"],
                   help="per-chip aggregation engine under --parallel ep: "
                        "'blocked' replaces the local segment scatters "
                        "with the scatter-free blocked engine "
                        "(ops/blocked.py) — for HBM-resident per-chip "
                        "edge loads")
    p.add_argument("--parallel", default="auto",
                   choices=["auto", "dp", "ep"],
                   help="multi-device strategy with --n-devices > 1: 'dp' "
                        "shards batches over the mesh; 'ep' edge-partitions "
                        "ONE giant batch-graph per step across chips "
                        "(parallel/ep.py) — the scale-up path for batches "
                        "too big for one chip (igmc only). auto = dp")
    p.add_argument("--extract-backend", default="auto",
                   choices=["auto", "numpy", "native"],
                   help="subgraph extraction engine")
    p.add_argument("--profile-dir", default="",
                   help="if set, write a jax.profiler trace of one epoch here")
    p.add_argument("--compilation-cache-dir",
                   default=os.environ.get("IGMC_TPU_COMPILATION_CACHE", ""),
                   help="persistent XLA compilation cache directory "
                        "(jax_compilation_cache_dir). Full 40-epoch CLI "
                        "wall-clock is compile-dominated on the tunneled "
                        "backend (~2 min of 214 s, PARITY.md) — re-runs of "
                        "the same shapes skip it entirely with a warm "
                        "cache. Also via $IGMC_TPU_COMPILATION_CACHE")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="R-GCN trunk compute dtype; bfloat16 halves message "
                        "bandwidth at matching RMSE (measured, PARITY.md)")
    p.add_argument("--conv-strategy", default="auto",
                   choices=["auto", "dispatch", "basis-mix", "per-edge"],
                   help="R-GCN relation-transform strategy (auto: dispatch "
                        "for small R, basis-mix for large R like yahoo_music)")
    p.add_argument("--superbatch", type=int, default=8,
                   help="stack this many equal-shape batches into one "
                        "lax.scan dispatch (single-device; 0 disables)")
    p.add_argument("--batch-mode", default="auto",
                   choices=["auto", "flat", "dense"],
                   help="graph batch layout: 'flat' = disjoint edge list + "
                        "segment aggregation; 'dense' = per-graph node "
                        "slots + all-MXU matmul aggregation (~10-25x "
                        "faster per step on TPU, batching/dense.py). "
                        "auto: dense whenever possible — static data "
                        "device-resident, dynamic data host-collated "
                        "(forward-only slot edges upload ~5x fewer bytes "
                        "than flat); both run data-parallel under "
                        "--n-devices when --batch-size splits evenly")
    p.add_argument("--flat-aggregate", default="auto",
                   choices=["auto", "segment", "blocked", "pallas"],
                   help="flat-layout R-GCN aggregation engine (igmc only): "
                        "'segment' = XLA gather/scatter (fastest while the "
                        "batch fits VMEM); 'blocked' = scatter-free one-hot "
                        "matmul blocks, fwd AND bwd (ops/blocked.py, the "
                        "HBM-resident giant-batch path, trains with "
                        "adj_dropout); 'pallas' = fused kernel "
                        "(kernels/rgcn_aggregate.py, inference-leaning). "
                        "auto = segment. Forces batch-mode flat.")
    p.add_argument("--dense-strategy", default="auto",
                   choices=["auto", "edge", "adjacency"],
                   help="dense-layout aggregation strategy (batch-mode "
                        "dense): 'edge' = per-edge one-hot matmuls (the "
                        "measured production path), 'adjacency' = "
                        "precomputed per-relation [B,R,n,n] adjacencies "
                        "shared by all layers (models/rgcn.py). auto = edge")
    p.add_argument("--dense-layout", default="auto",
                   choices=["auto", "unified", "bipartite"],
                   help="dense slot layout (batch-mode dense, static data): "
                        "'unified' = one n-row slot per graph; 'bipartite' "
                        "= users and items in separate static slot ranges, "
                        "halving the R-GCN trunk's one-hot matmul widths "
                        "with identical math (batching/dense.py "
                        "DenseBatch.num_u; igmc only). auto = bipartite "
                        "for static igmc dense runs whose MEDIAN graph reaches "
                        "~128 nodes (where the halved widths still fill "
                        "the 128-wide MXU tile: 1.3-1.9x measured), else "
                        "unified")
    p.add_argument("--dense-buckets", type=int, default=3,
                   help="max dense slot shapes (batch_mode=dense): more "
                        "buckets = less padded compute per epoch but ~2 "
                        "extra compiled programs each; the split minimizes "
                        "total padded n*e cost (batching/dense.py)")
    p.add_argument("--dense-chunk", type=int, default=0, metavar="N",
                   help="giant-batch training (batch-mode dense, static "
                        "data, single device): take ONE optimizer step per "
                        "--batch-size graphs, streamed on device in "
                        "N-graph slices whose intermediates stay "
                        "VMEM-resident (train/loop.py "
                        "make_chunked_dense_device_train_step — the "
                        "HBM-resident path bench.py measures at 1.25x the "
                        "HBM-streaming bound). Must divide --batch-size. "
                        "0 = off")
    return p


def rating_maps(args):
    """rating_map (--standard-rating) and post_rating_map (transfer bucketing),
    mirroring /root/reference/Main.py:153-177."""
    rating_map, post_rating_map = None, None
    if args.standard_rating:
        if args.data_name in ("flixster", "ml_10m"):  # 0.5, 1, ..., 5
            rating_map = {x: int(math.ceil(x))
                          for x in np.arange(0.5, 5.01, 0.5).tolist()}
        elif args.data_name == "yahoo_music":  # 1..100
            rating_map = {x: (x - 1) // 20 + 1 for x in range(1, 101)}
    if args.transfer:
        if args.data_name in ("flixster", "ml_10m"):
            post_rating_map = {
                x: int(i // (10 / args.num_relations))
                for i, x in enumerate(np.arange(0.5, 5.01, 0.5).tolist())
            }
        elif args.data_name == "yahoo_music":
            post_rating_map = {
                x: int(i // (100 / args.num_relations))
                for i, x in enumerate(np.arange(1, 101).tolist())
            }
        else:  # standard 1..5 ratings
            post_rating_map = {
                x: int(i // (5 / args.num_relations))
                for i, x in enumerate(np.arange(1, 6).tolist())
            }
    return rating_map, post_rating_map


def load_split(args, rating_map, post_rating_map):
    from ..data import (create_trainvaltest_split, load_data_monti,
                        load_official_trainvaltest_split)

    if args.data_name in ("flixster", "douban", "yahoo_music"):
        return load_data_monti(args.data_name, args.testing, rating_map,
                               post_rating_map)
    if args.data_name == "ml_100k":
        print("Using official MovieLens split u1.base/u1.test with 20% validation...")
        return load_official_trainvaltest_split(
            args.data_name, args.testing, rating_map, post_rating_map, args.ratio
        )
    # ml_1m / ml_10m / ml_25m: random split with pickle cache
    if args.use_features:
        datasplit_path = os.path.join(
            "raw_data", args.data_name,
            f"withfeatures_split_seed{args.data_seed}.pickle",
        )
    else:
        datasplit_path = os.path.join(
            "raw_data", args.data_name, f"split_seed{args.data_seed}.pickle"
        )
    return create_trainvaltest_split(
        args.data_name, args.data_seed, args.testing, datasplit_path,
        not args.reprocess, True, rating_map, post_rating_map, args.ratio,
    )


def build_datasets(args, split):
    from ..batching import DynamicGraphDataset, StaticGraphDataset
    from ..graphs import BipartiteCSR

    if args.dynamic_dataset:
        args.dynamic_train = args.dynamic_test = args.dynamic_val = True

    u_features = v_features = None
    n_features = 0
    if args.use_features:
        u_features = split.u_features.toarray()
        v_features = split.v_features.toarray()
        n_features = u_features.shape[1] + v_features.shape[1]
        print("Number of user features {}, item features {}, total features {}"
              .format(u_features.shape[1], v_features.shape[1], n_features))

    tr_u, tr_v = split.train_u_indices, split.train_v_indices
    va_u, va_v = split.val_u_indices, split.val_v_indices
    te_u, te_v = split.test_u_indices, split.test_v_indices
    tr_l, va_l, te_l = split.train_labels, split.val_labels, split.test_labels
    if args.debug:  # truncate to 1000 links, /root/reference/Main.py:276-280
        nd = 1000
        tr_u, tr_v, tr_l = tr_u[:nd], tr_v[:nd], tr_l[:nd]
        va_u, va_v, va_l = va_u[:nd], va_v[:nd], va_l[:nd]
        te_u, te_v, te_l = te_u[:nd], te_v[:nd], te_l[:nd]
    print("#train: %d, #val: %d, #test: %d" % (len(tr_u), len(va_u), len(te_u)))

    mode = "testmode" if args.testing else "valmode"
    combo = f"{args.data_name}{args.data_appendix}"
    data_root = os.path.join("data", combo, mode)
    if args.reprocess:
        for s in ("train", "val", "test"):
            d = os.path.join(data_root, s)
            if os.path.isdir(d):
                rmtree(d)

    A = BipartiteCSR(split.adj_train)
    mnph = args.max_nodes_per_hop if args.max_nodes_per_hop > 0 else None
    common = dict(
        h=args.hop, sample_ratio=args.sample_ratio, max_nodes_per_hop=mnph,
        u_features=u_features, v_features=v_features,
        class_values=split.class_values, backend=args.extract_backend,
    )

    def make(dynamic, sub, links, labels, max_num):
        cls = DynamicGraphDataset if dynamic else StaticGraphDataset
        root = os.path.join(data_root, sub)
        return cls(root, A, links, labels, max_num=max_num, **common)

    train_graphs = make(args.dynamic_train, "train", (tr_u, tr_v), tr_l,
                        args.max_train_num)
    test_graphs = make(args.dynamic_test, "test", (te_u, te_v), te_l,
                       args.max_test_num)
    val_graphs = None
    if not args.testing:
        val_graphs = make(args.dynamic_val, "val", (va_u, va_v), va_l,
                          args.max_val_num)
        test_graphs = val_graphs  # evaluate on val in valmode
    print("Used #train graphs: %d, #test graphs: %d"
          % (len(train_graphs), len(test_graphs)))
    return train_graphs, val_graphs, test_graphs, n_features


def build_model(args, split, n_features, train_graphs=None):
    import jax

    from ..models import (
        DGCNNConfig, IGMCConfig, GNNConfig,
        dgcnn_forward, dgcnn_init, gnn_forward, gnn_init,
        igmc_forward, igmc_init,
    )

    num_features = 2 * args.hop + 2
    if args.transfer:
        num_relations = args.num_relations
        multiply_by = args.multiply_by
    else:
        num_relations = len(split.class_values)
        multiply_by = 1.0

    key = jax.random.PRNGKey(args.seed)
    if args.model == "igmc":
        cfg = IGMCConfig(
            num_features=num_features, latent_dim=(32, 32, 32, 32),
            num_relations=num_relations, num_bases=args.num_bases,
            adj_dropout=args.adj_dropout,
            force_undirected=args.force_undirected,
            side_features=args.use_features, n_side_features=n_features,
            multiply_by=multiply_by, aggr=args.aggr,
            conv_strategy=args.conv_strategy,
            compute_dtype=(None if args.compute_dtype == "float32"
                           else args.compute_dtype),
            flat_aggregate=("segment" if args.flat_aggregate == "auto"
                            else args.flat_aggregate),
            use_pallas=args.flat_aggregate == "pallas",
            dense_strategy=args.dense_strategy,
        )
        params = igmc_init(key, cfg)
        fwd = lambda p, b, key=None, training=False: igmc_forward(
            p, b, cfg, key, training)
    elif args.model == "gnn":
        cfg = GNNConfig(num_features=num_features,
                        adj_dropout=args.adj_dropout,
                        force_undirected=args.force_undirected)
        params = gnn_init(key, cfg)
        fwd = lambda p, b, key=None, training=False: gnn_forward(
            p, b, cfg, key, training)
    else:  # dgcnn / dgcnn_rs
        # SortPool k = the 60th-percentile node count of the training set
        # (min 10), as the reference derives it (/root/reference/models.py:70-74).
        from ..models.igmc import sortpool_k_from_dataset

        k = 30
        if train_graphs is not None and hasattr(train_graphs, "node_counts"):
            nc = train_graphs.node_counts()
            if len(nc):
                k = sortpool_k_from_dataset(nc, 0.6)
        cfg = DGCNNConfig(
            num_features=num_features, latent_dim=(32, 32, 32, 1), k=k,
            adj_dropout=args.adj_dropout,
            force_undirected=args.force_undirected,
            relational=(args.model == "dgcnn_rs"),
            num_relations=num_relations, num_bases=4,
        )
        params = dgcnn_init(key, cfg)
        fwd = lambda p, b, key=None, training=False: dgcnn_forward(
            p, b, cfg, key, training)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"Total number of parameters is {n_params}")
    return fwd, params, cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..utils import ResultsDir, make_logger, seed_everything

    if args.compilation_cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache_dir)
        # Cache every program: the run compiles many small per-bucket
        # programs whose individual compile times sit under the default
        # 1 s / 32 KB persistence thresholds but dominate in aggregate.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    seed_everything(args.seed)
    print(args)

    rating_map, post_rating_map = rating_maps(args)
    split = load_split(args, rating_map, post_rating_map)
    print("All ratings are:")
    print(split.class_values)

    res = ResultsDir("results", args.data_name, args.save_appendix, args.testing)
    res.record_cmd()
    if not args.keep_old and not args.transfer:
        # provenance snapshot, mirroring /root/reference/Main.py:200-205
        res.snapshot_source()

    train_graphs, val_graphs, test_graphs, n_features = build_datasets(args, split)
    fwd, params, cfg = build_model(args, split, n_features, train_graphs)

    from ..train import (load_checkpoint, resolve_checkpoint, test_once,
                         test_once_ep, train_multiple_epochs,
                         train_multiple_epochs_ep)

    logger = make_logger(res, args.save_interval)
    parallel = args.parallel
    if parallel == "auto":
        parallel = "dp"
    if parallel == "ep":
        if args.model != "igmc":
            raise SystemExit("--parallel ep implements the IGMC model "
                             "(see parallel/ep.py); use --model igmc")
        if args.dense_chunk:
            raise SystemExit("--dense-chunk is the single-device "
                             "giant-batch path; under --parallel ep the "
                             "giant batch is already edge-partitioned "
                             "across devices — drop --dense-chunk")
        if args.dense_layout != "auto":
            raise SystemExit("--dense-layout applies to the dense batch "
                             "layout; --parallel ep uses the "
                             "edge-partitioned layout — drop "
                             "--dense-layout")
        from ..parallel import make_mesh

        D = max(args.n_devices, 1)
        ep_mesh = make_mesh(n_data=D)
        print(f"Edge-partitioned training over {D} devices")
        state = None
        if not args.no_train:
            _, state = train_multiple_epochs_ep(
                train_graphs, test_graphs, cfg, params, mesh=ep_mesh,
                epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
                lr_decay_factor=args.lr_decay_factor,
                lr_decay_step_size=args.lr_decay_step_size,
                weight_decay=0.0, ARR=args.ARR, test_freq=args.test_freq,
                logger=logger, continue_from=args.continue_from,
                res_dir=res.path, seed=args.seed,
                profile_dir=args.profile_dir or None,
                local_aggregate=args.ep_local_aggregate,
            )
        ckpt_dir = args.transfer if args.transfer else res.path
        model_pos = resolve_checkpoint(ckpt_dir, "model", args.epochs)
        if args.visualize:
            print("--visualize under --parallel ep: rerun without ep "
                  "(visualization evaluates per-subgraph on one device)")
        if args.ensemble:
            if args.data_name == "ml_1m":
                se, ee, iv = args.epochs - 15, args.epochs, 5
            else:
                se, ee, iv = args.epochs - 30, args.epochs, 10
            checkpoints = [resolve_checkpoint(ckpt_dir, "model", x)
                           for x in range(se, ee + 1, iv)
                           if os.path.isfile(resolve_checkpoint(
                               ckpt_dir, "model", x))]
            rmse = test_once_ep(test_graphs, cfg, params, args.batch_size,
                                ep_mesh, ensemble=True,
                                checkpoints=checkpoints)
            print("Ensemble test rmse is: {:.6f}".format(rmse))
            res.log_line("Epoch ensemble of range({}, {}, {}), train loss "
                         "{:.4f}, test rmse {:.6f}".format(se, ee, iv, 0,
                                                           rmse))
        elif args.transfer:
            params_t = load_checkpoint(model_pos, params)
            rmse = test_once_ep(test_graphs, cfg, params, args.batch_size,
                                ep_mesh, params=params_t)
            print("Test rmse is: {:.6f}".format(rmse))
            res.log_line("Epoch transfer {}, epochs {}, train loss {:.4f}, "
                         "test rmse {:.6f}".format(args.transfer,
                                                   args.epochs, 0, rmse))
        return

    flat_aggregate = (None if args.flat_aggregate in ("auto", "segment")
                      else args.flat_aggregate)
    if flat_aggregate is not None and args.model != "igmc":
        raise SystemExit("--flat-aggregate blocked/pallas applies to the "
                         "R-GCN trunk; use --model igmc")
    batch_mode = args.batch_mode
    if flat_aggregate is not None:
        if batch_mode == "dense":
            raise SystemExit("--flat-aggregate conflicts with "
                             "--batch-mode dense (pick one layout)")
        batch_mode = "flat"
        print(f"batch mode: flat (--flat-aggregate {flat_aggregate})")
    elif batch_mode == "auto" and args.dense_chunk:
        batch_mode = "dense"
        print("batch mode: dense (--dense-chunk)")
    elif batch_mode == "auto":
        # Every model family has a dense trunk (igmc: rgcn_dense_apply;
        # gnn/dgcnn: gcn_dense_apply + dense_sort_pool). Static datasets
        # run it device-resident (dense DP shards packed gid blocks over
        # the mesh); dynamic datasets run it host-collated (round 4:
        # 1.9-2.5x faster end-to-end than flat, PARITY.md), under DP with
        # the collated graph axis sharded. Both need an evenly-splitting
        # batch for DP.
        dp_ok = (args.n_devices <= 1
                 or args.batch_size % args.n_devices == 0)
        batch_mode = "dense" if dp_ok else "flat"
        print(f"batch mode: {batch_mode} (auto)")
    if args.dense_chunk:
        if args.dense_chunk < 1:
            raise SystemExit(f"--dense-chunk must be a positive graph "
                             f"count, got {args.dense_chunk}")
        if batch_mode != "dense":
            raise SystemExit("--dense-chunk needs the dense layout "
                             "(conflicts with --batch-mode flat / "
                             "--flat-aggregate)")
        if args.dynamic_train or args.dynamic_test or args.dynamic_val:
            raise SystemExit("--dense-chunk needs static (packed) datasets "
                             "— drop the --dynamic-* flags")
        if args.n_devices > 1:
            raise SystemExit("--dense-chunk is single-device; for "
                             "multi-chip giant batches use --parallel ep "
                             "or dense DP (--n-devices without "
                             "--dense-chunk)")
        if args.dense_chunk < args.batch_size \
                and args.batch_size % args.dense_chunk:
            raise SystemExit(f"--dense-chunk ({args.dense_chunk}) must "
                             f"divide --batch-size ({args.batch_size})")
    static_data = not (args.dynamic_train or args.dynamic_test
                       or args.dynamic_val)
    dense_layout = args.dense_layout
    if dense_layout == "bipartite":  # explicit: validate, any size
        if args.model != "igmc":
            raise SystemExit("--dense-layout bipartite applies to the "
                             "R-GCN trunk; use --model igmc")
        if batch_mode != "dense" or not static_data:
            raise SystemExit("--dense-layout bipartite needs the "
                             "device-resident dense path (batch-mode dense "
                             "+ static datasets)")
        if args.dense_strategy == "adjacency":
            raise SystemExit("--dense-strategy adjacency is unified-layout "
                             "only (models/igmc.py); drop it or use "
                             "--dense-layout unified")
    elif dense_layout == "auto":
        # bipartite halves the one-hot widths but only WINS once per-side
        # slot widths reach the 128-lane tile (~64 rows/side, i.e. graphs
        # of ~128+ nodes); at small slots it is a measured wash
        # (results_archive/dense_strategy_study_r05). Gate on the MEDIAN
        # node count so the dominant buckets decide: ml_1m mnph100
        # (median 202) -> bipartite; douban/flixster/yahoo (medians
        # 97/35/35) stay unified and their archived quality bands
        # reproduce exactly.
        big = False
        if (batch_mode == "dense" and args.model == "igmc" and static_data
                and args.dense_strategy != "adjacency"):
            # adjacency strategy is unified-layout only
            try:
                nc = train_graphs.node_counts()
                big = len(nc) > 0 and float(np.median(nc)) >= 128
            except Exception:
                big = False
        dense_layout = "bipartite" if big else "unified"
        if batch_mode == "dense":
            print(f"dense layout: {dense_layout} (auto)")
    mesh = None
    if args.n_devices > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(n_data=args.n_devices)
        print(f"Data-parallel training over {args.n_devices} devices")
    elif args.n_devices == 1:
        print("--n-devices 1: single device, using the plain training path")
    state = None
    if not args.no_train:
        _, state = train_multiple_epochs(
            train_graphs, test_graphs, fwd, params,
            epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
            lr_decay_factor=args.lr_decay_factor,
            lr_decay_step_size=args.lr_decay_step_size,
            weight_decay=0.0, ARR=args.ARR, test_freq=args.test_freq,
            logger=logger, continue_from=args.continue_from,
            res_dir=res.path, seed=args.seed,
            profile_dir=args.profile_dir or None,
            superbatch=args.superbatch, mesh=mesh,
            batch_mode=batch_mode, dense_buckets=args.dense_buckets,
            flat_aggregate=flat_aggregate, dense_chunk=args.dense_chunk,
            dense_layout=dense_layout,
        )

    # resolve_checkpoint accepts both this framework's .ckpt and the
    # reference's .pth, so --transfer/--ensemble work directly against a
    # reference results directory (train/torch_interop.py).
    ckpt_dir = args.transfer if args.transfer else res.path
    model_pos = resolve_checkpoint(ckpt_dir, "model", args.epochs)

    if args.visualize:
        from ..train.visualize import visualize

        params_v = load_checkpoint(model_pos, params)
        visualize(fwd, params_v, test_graphs, res.path, args.data_name,
                  split.class_values, batch_size=args.batch_size)
        if args.transfer:
            rmse = test_once(test_graphs, fwd, params, args.batch_size,
                             params=params_v, logger=logger,
                             batch_mode=batch_mode)
            print("Transfer learning rmse is: {:.6f}".format(rmse))
        return

    if args.ensemble:
        # Checkpoint ranges per /root/reference/Main.py:437-441.
        if args.data_name == "ml_1m":
            start_epoch, end_epoch, interval = args.epochs - 15, args.epochs, 5
        else:
            start_epoch, end_epoch, interval = args.epochs - 30, args.epochs, 10
        checkpoints = [
            resolve_checkpoint(ckpt_dir, "model", x)
            for x in range(start_epoch, end_epoch + 1, interval)
        ]
        # The reference crashed here when --save-interval skipped epochs in
        # the ensemble range (e.g. ml_1m wants every 5 but the default saves
        # every 10). Ensemble whatever was actually saved instead.
        missing = [c for c in checkpoints if not os.path.isfile(c)]
        if missing:
            checkpoints = [c for c in checkpoints if os.path.isfile(c)]
            if not checkpoints:
                raise FileNotFoundError(
                    f"no checkpoints in ensemble range "
                    f"range({start_epoch}, {end_epoch + 1}, {interval}) under "
                    f"{ckpt_dir}; train with --save-interval <= {interval}")
            print(f"ensemble: {len(missing)} checkpoint(s) in the range were "
                  f"never saved (--save-interval?); using {len(checkpoints)}: "
                  + ", ".join(os.path.basename(c) for c in checkpoints))
        if args.transfer:
            epoch_info = "transfer {}, ensemble of range({}, {}, {})".format(
                args.transfer, start_epoch, end_epoch, interval)
        else:
            epoch_info = "ensemble of range({}, {}, {})".format(
                start_epoch, end_epoch, interval)
        rmse = test_once(test_graphs, fwd, params, args.batch_size,
                         ensemble=True, checkpoints=checkpoints,
                         batch_mode=batch_mode,
                         flat_aggregate=flat_aggregate,
                         dense_chunk=args.dense_chunk,
                         dense_layout=dense_layout)
        print("Ensemble test rmse is: {:.6f}".format(rmse))
    elif args.transfer:
        params_t = load_checkpoint(model_pos, params)
        rmse = test_once(test_graphs, fwd, params, args.batch_size,
                         params=params_t, batch_mode=batch_mode,
                         flat_aggregate=flat_aggregate,
                         dense_chunk=args.dense_chunk,
                         dense_layout=dense_layout)
        epoch_info = "transfer {}, epochs {}".format(args.transfer, args.epochs)
        print("Test rmse is: {:.6f}".format(rmse))
    else:
        return  # plain training run: results already logged per-epoch

    res.log_line("Epoch {}, train loss {:.4f}, test rmse {:.6f}".format(
        epoch_info, 0, rmse))


if __name__ == "__main__":
    if __package__ in (None, ""):
        # Direct-script invocation (`python igmc_tpu/cli/main.py`, the
        # reference's `python Main.py` habit): bootstrap the package so the
        # relative imports above resolve, then re-enter through it.
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        from igmc_tpu.cli.main import main as _main

        _main()
    else:
        main()
