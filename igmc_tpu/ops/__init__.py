from .segment import segment_sum, masked_segment_mean, masked_segment_sum
from .dropout import edge_dropout, feature_dropout
from .sort_pool import dense_sort_pool, global_sort_pool
from .blocked import (BlockedEdges, BlockedPlan, blocked_degree,
                      blocked_rgcn_aggregate, dropout_masks,
                      plan_blocked_edges)

__all__ = [
    "segment_sum", "masked_segment_mean", "masked_segment_sum",
    "edge_dropout", "feature_dropout", "global_sort_pool",
    "dense_sort_pool",
    "BlockedEdges", "BlockedPlan", "blocked_degree",
    "blocked_rgcn_aggregate", "dropout_masks", "plan_blocked_edges",
]
