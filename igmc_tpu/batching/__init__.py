from .batch import GraphBatch, collate, pad_ladder, bucket_for
from .dense import DenseBatch, collate_dense, plan_dense_buckets
from .dataset import StaticGraphDataset, DynamicGraphDataset, BatchLoader

__all__ = [
    "GraphBatch", "collate", "pad_ladder", "bucket_for",
    "DenseBatch", "collate_dense", "plan_dense_buckets",
    "StaticGraphDataset", "DynamicGraphDataset", "BatchLoader",
]
