from .mesh import make_mesh, batch_sharding, replicated_sharding
from .dp import (make_dp_train_step, make_dp_scan_train_step,
                 make_dp_eval_step, stack_batches, split_for_devices)
from .ep import (EPBatch, EPCaps, EPBlocked, build_ep_blocked,
                 pad_ep_blocked, max_ep_blocked_blocks, ep_blocked_blocks,
                 partition_batch, pad_ep_batch,
                 build_ep_batches, ep_batch_caps, max_ep_caps,
                 make_ep_forward, make_ep_train_step, make_ep_eval_step,
                 ep_train_epoch, ep_eval_sums, ep_predict_all)
from .multihost import (process_shard_indices, Subset,
                        global_batch_from_local, capacity_ladders,
                        dynamic_capacity_ladders)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "make_dp_train_step", "make_dp_scan_train_step", "make_dp_eval_step",
    "stack_batches",
    "split_for_devices",
    "EPBatch", "EPCaps", "EPBlocked", "build_ep_blocked",
    "pad_ep_blocked", "max_ep_blocked_blocks", "ep_blocked_blocks",
    "partition_batch", "pad_ep_batch",
    "build_ep_batches", "ep_batch_caps", "max_ep_caps",
    "make_ep_forward", "make_ep_train_step", "make_ep_eval_step",
    "ep_train_epoch", "ep_eval_sums", "ep_predict_all",
    "process_shard_indices", "Subset", "global_batch_from_local",
    "capacity_ladders", "dynamic_capacity_ladders",
]
