"""igmc_tpu — a TPU-native framework for inductive graph-based matrix completion.

A from-scratch JAX/XLA/Pallas implementation of the IGMC capability set
(Zhang & Chen, ICLR 2020; reference implementation muhanzhang/IGMC):
enclosing-subgraph extraction with hop/side node labeling, basis-decomposed
relational graph convolutions, target-node readout, ARR regularization,
checkpoint ensembling and zero-shot transfer across rating graphs.

Layout:
  data/     raw dataset loaders + train/val/test split construction (host, NumPy)
  graphs/   enclosing-subgraph extraction + node labeling (host; NumPy + C++)
  batching/ variable-size subgraphs -> fixed-shape padded device batches
  models/   R-GCN / IGMC / DGCNN model families (functional param pytrees)
  ops/      segment ops, edge dropout, sort-pool, Pallas kernels
  train/    jitted train/eval loops, checkpoints, ensembling, transfer
  parallel/ device meshes, data-parallel & edge-partitioned sharding
  cli/      experiment driver matching the reference flag surface
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: serving pulls in jax/batching; keep bare `import igmc_tpu` light.
    if name == "Predictor":
        from .serve import Predictor

        return Predictor
    raise AttributeError(name)
