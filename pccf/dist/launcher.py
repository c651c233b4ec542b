"""DistributedWorker: API-parity launcher for data-parallel runs.

The reference spawns one process per GPU with a TCP rendezvous
(src/utils/parallel.py:17-66).  Under SPMD/pjit there is nothing to spawn on
a single host: one process drives all local devices, and the batch-axis mesh
provides the parallelism.  This shim keeps the call surface
(``DistributedWorker(fn, n).spawn(cfg)``) and validates that the requested
device count exists; on multi-host slices it initialises
``jax.distributed`` (one process per host, as TPU runtimes expect).
"""

from __future__ import annotations

import logging
from typing import Any, Callable

logger = logging.getLogger('pccf')


class DistributedWorker:
    """Run a training function over ``n_devices`` data-parallel devices."""

    def __init__(self, work_fn: Callable[[Any], None], n_devices: int) -> None:
        self.work_fn = work_fn
        self.n_devices = n_devices

    def spawn(self, cfg: Any) -> None:
        import jax

        from pccf.dist.mesh import initialize_distributed

        initialize_distributed()
        available = len(jax.devices())
        if self.n_devices > available:
            raise RuntimeError(
                f'Requested {self.n_devices} devices but only {available} are attached. '
                'On TPU, parallelism is per-device within one process (no subprocess '
                'spawning); check user.n_subprocesses.'
            )
        logger.info(
            'data-parallel run over %d device(s) (single-program SPMD; '
            'no process spawning needed)', self.n_devices,
        )
        # actually restrict the run: everything built on get_mesh() default
        # (Trainer, Test, serving) spans exactly the requested devices, not
        # all attached ones
        from pccf.dist.mesh import set_default_mesh_devices

        set_default_mesh_devices(self.n_devices)
        try:
            self.work_fn(cfg)
        finally:
            set_default_mesh_devices(None)
