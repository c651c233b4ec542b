"""Distributed execution: device mesh + data-parallel sharding."""

from pccf.dist.mesh import (
    get_mesh,
    host_batch_to_global,
    initialize_distributed,
    is_main_process,
    replicate,
    shard_batch,
)

__all__ = [
    'get_mesh',
    'host_batch_to_global',
    'initialize_distributed',
    'is_main_process',
    'replicate',
    'shard_batch',
]
