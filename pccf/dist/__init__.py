"""Distributed execution: device mesh + data-parallel sharding."""

from pccf.dist.pp import pipeline_apply, shard_stacked_params, stack_layer_params
from pccf.dist.sp import sp_chamfer, sp_knn, sp_match_cost
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
    'pipeline_apply',
    'replicate',
    'shard_batch',
    'shard_stacked_params',
    'stack_layer_params',
    'sp_chamfer',
    'sp_knn',
    'sp_match_cost',
]
