from .rgcn_aggregate import (
    block_align_edges, pallas_available, rgcn_aggregate_pallas,
)

__all__ = ["block_align_edges", "pallas_available", "rgcn_aggregate_pallas"]
