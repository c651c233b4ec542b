"""Parameter sharding rules: tensor-parallel layouts over a 2-D mesh.

The reference has data parallelism only (SURVEY §2.7); pccf additionally
supports sharding large dense kernels over a model axis — under GSPMD the
matching collectives (all-gather of activations / reduce-scatter of
gradients) are inserted by XLA from the parameter layout alone.

Usage:
    mesh = Mesh(devices.reshape(dp, mp), ('dp', 'mp'))
    params = shard_params_tp(params, mesh, min_size=256)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def tp_spec(path: tuple, value: Any, mesh: Mesh, axis: str, min_size: int) -> P:
    """PartitionSpec for one parameter leaf.

    Matrix-shaped kernels with a large, divisible output dimension are sharded
    on the model axis (column parallel); everything else is replicated.
    """
    mp = mesh.shape[axis]
    shape = getattr(value, 'shape', ())
    if len(shape) >= 2 and shape[-1] >= min_size and shape[-1] % mp == 0:
        name = str(path[-1]) if path else ''
        if 'kernel' in name or 'embedding' in name:
            return P(*([None] * (len(shape) - 1)), axis)
    return P()


def shard_params_tp(params: Any, mesh: Mesh, axis: str = 'mp', min_size: int = 256) -> Any:
    """Device-put a parameter pytree with column-parallel kernel sharding."""

    def put(path, value):
        spec = tp_spec(tuple(p.key if hasattr(p, 'key') else p for p in path), value, mesh, axis, min_size)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def ep_spec(path: tuple, value: Any, mesh: Mesh, axis: str, n_components: int) -> P:
    """PartitionSpec for expert-parallel PCGen components.

    The decoder's vmapped component stacks (``components`` /
    ``component_heads``, see pccf/nn/decoders.py) carry the component axis
    first; sharding it over ``axis`` runs each device's experts locally —
    GSPMD inserts the all-gather for the attention concat and the psum for
    the mixture contraction.  Everything else stays replicated.
    """
    ep = mesh.shape[axis]
    shape = getattr(value, 'shape', ())
    names = {str(getattr(p, 'key', p)) for p in path}
    if (
        ('components' in names or 'component_heads' in names)
        and len(shape) >= 1
        and shape[0] == n_components
        and n_components % ep == 0
    ):
        return P(axis, *([None] * (len(shape) - 1)))
    return P()


def shard_variables_ep(variables: Any, mesh: Mesh, n_components: int, axis: str = 'mp') -> Any:
    """Device-put a decoder variable tree (params + batch_stats) with the
    component axis sharded over ``axis`` (expert parallelism)."""

    def put(path, value):
        spec = ep_spec(
            tuple(p.key if hasattr(p, 'key') else p for p in path), value, mesh, axis, n_components
        )
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, variables)


def make_2d_mesh(n_devices: int, mp: int = 2) -> Mesh:
    """(dp, mp) mesh over the first ``n_devices`` devices.

    Raises on an impossible layout — a silently degraded mesh (mp=1, or
    fewer devices than requested) must never masquerade as the requested
    tensor-parallel one (same contract as ``pccf.dist.mesh.get_mesh``)."""
    available = jax.devices()
    if len(available) < n_devices:
        raise RuntimeError(
            f'requested a {n_devices}-device mesh but only '
            f'{len(available)} JAX device(s) are available'
        )
    if n_devices % mp:
        raise ValueError(
            f'cannot lay out {n_devices} devices as (dp, mp={mp}): '
            f'{n_devices} % {mp} != 0'
        )
    devices = np.asarray(available[:n_devices])
    return Mesh(devices.reshape(n_devices // mp, mp), ('dp', 'mp'))
