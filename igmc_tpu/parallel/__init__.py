from .mesh import make_mesh, batch_sharding, replicated_sharding
from .dp import make_dp_train_step, make_dp_eval_step, stack_batches, split_for_devices
from .ep import (EPBatch, partition_batch, make_ep_forward,
                 make_ep_train_step, make_ep_eval_step)
from .multihost import (process_shard_indices, Subset,
                        global_batch_from_local, capacity_ladders)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "make_dp_train_step", "make_dp_eval_step", "stack_batches",
    "split_for_devices",
    "EPBatch", "partition_batch", "make_ep_forward",
    "make_ep_train_step", "make_ep_eval_step",
    "process_shard_indices", "Subset", "global_batch_from_local",
    "capacity_ladders",
]
