"""TPU-native kernel layer: pure-jnp golden references + Pallas TPU kernels.

Use :mod:`pccf.kernels.api` for the dispatching entry points; the pure
implementations live in :mod:`pccf.kernels.ops`.
"""

from pccf.kernels.ops import (
    approx_match,
    chamfer,
    edge_features,
    gather_neighbors,
    graph_filtering,
    graph_max_pool,
    knn,
    match_cost,
    nn_distance,
    one_hot_idx,
    self_square_distance,
    square_distance,
    straight_through,
    vq_assign,
    vq_lookup,
)

__all__ = [
    'approx_match',
    'chamfer',
    'edge_features',
    'gather_neighbors',
    'graph_filtering',
    'graph_max_pool',
    'knn',
    'match_cost',
    'nn_distance',
    'one_hot_idx',
    'self_square_distance',
    'square_distance',
    'straight_through',
    'vq_assign',
    'vq_lookup',
]
