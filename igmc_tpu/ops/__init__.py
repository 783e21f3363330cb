from .segment import segment_sum, masked_segment_mean, masked_segment_sum
from .dropout import edge_dropout, feature_dropout
from .sort_pool import global_sort_pool

__all__ = [
    "segment_sum", "masked_segment_mean", "masked_segment_sum",
    "edge_dropout", "feature_dropout", "global_sort_pool",
]
