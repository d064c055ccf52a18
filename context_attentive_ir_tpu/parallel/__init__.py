"""SPMD data parallelism over a ('data',) mesh (SURVEY.md SS5.8)."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)

__all__ = ["DATA_AXIS", "batch_sharding", "make_mesh", "pad_to_multiple",
           "replicated", "shard_batch"]
