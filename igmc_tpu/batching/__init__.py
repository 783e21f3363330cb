from .batch import GraphBatch, collate, pad_ladder, bucket_for
from .dataset import StaticGraphDataset, DynamicGraphDataset, BatchLoader

__all__ = [
    "GraphBatch", "collate", "pad_ladder", "bucket_for",
    "StaticGraphDataset", "DynamicGraphDataset", "BatchLoader",
]
