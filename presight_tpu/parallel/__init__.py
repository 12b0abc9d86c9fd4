"""Mesh/sharding specs for multi-chip training."""

from .mesh import (
    data_sharded,
    make_mesh,
    opt_state_shardings,
    replicate,
    replicated,
    shard_batch,
    shard_opt_state,
    shard_train_state,
)
