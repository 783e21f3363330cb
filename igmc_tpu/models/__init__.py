from .rgcn import (
    rgcn_init, rgcn_apply, rgcn_relation_weights,
    gcn_init, gcn_apply,
    linear_init, linear_apply,
)
from .igmc import (
    IGMCConfig, igmc_init, igmc_forward, arr_regularizer,
    chunk_dense_batch, igmc_forward_dense_chunked,
    GNNConfig, gnn_init, gnn_forward,
    DGCNNConfig, dgcnn_init, dgcnn_forward,
)

__all__ = [
    "rgcn_init", "rgcn_apply", "rgcn_relation_weights",
    "gcn_init", "gcn_apply", "linear_init", "linear_apply",
    "IGMCConfig", "igmc_init", "igmc_forward", "arr_regularizer",
    "chunk_dense_batch", "igmc_forward_dense_chunked",
    "GNNConfig", "gnn_init", "gnn_forward",
    "DGCNNConfig", "dgcnn_init", "dgcnn_forward",
]
