"""Device mesh and sharding helpers (data parallelism over ICI/DCN).

TPU-native replacement for the reference's ``DistributedWorker`` DDP spawner
(src/utils/parallel.py:17-66).  Instead of one process per GPU with NCCL
all-reduce, pccf runs a single program per host: a 1-D ``Mesh`` over all
devices with the global batch sharded along ``dp``.  Gradient averaging is the
GSPMD-inserted collective over the batch axis — no explicit all-reduce, no
rendezvous, no free-port probing.

The config semantics carry over: ``user.n_subprocesses`` (device count) still
validates global-batch divisibility (specs.py batch_size_per_device).  On a
multi-host slice call :func:`initialize_distributed` first (equivalent of the
reference's process-group init, parallel.py:42-53).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = 'dp'


def initialize_distributed() -> None:
    """Multi-host init (jax.distributed); no-op on a single host."""
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialised or single-process


@functools.lru_cache(maxsize=8)
def get_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array leaf with the batch axis sharded over ``dp``.

    Leaves whose batch dimension is not divisible by the mesh (trailing
    evaluation batches) are replicated instead — correct, marginally slower,
    and only ever hit on the final partial batch of an eval pass."""
    sharded = batch_sharding(mesh)
    repl = replicated(mesh)
    n = mesh.devices.size

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        use = sharded if x.ndim >= 1 and x.shape[0] % n == 0 else repl
        return jax.device_put(x, use)

    return jax.tree.map(put, batch, is_leaf=lambda x: x is None)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def host_batch_to_global(batch: Any, mesh: Mesh) -> Any:
    """On multi-host: assemble a global array from per-host shards."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(np.asarray(x), mesh, P(DATA_AXIS)),
        batch,
        is_leaf=lambda x: x is None,
    )


def is_main_process() -> bool:
    """Rank-0 gating (reference pattern: dist.get_rank() != 0 guards,
    train_classifier.py:50-51)."""
    return jax.process_index() == 0
