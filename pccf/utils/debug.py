"""Runtime diagnostics: NaN/Inf guards and on-device profiling.

Capability parity with the reference's debugger-mode NaN/Inf hooks
(src/module/layers.py:18,240-258 — forward/backward hooks that drop into
pdb): in JAX the equivalent is the global ``debug_nans``/``debug_infs``
switch, which re-runs the offending op un-jitted and raises with a precise
location.  Profiling uses ``jax.profiler`` traces viewable in TensorBoard
or Perfetto (the reference has no profiler; TPU-native addition).
"""

from __future__ import annotations

import contextlib
import pathlib
import time
from typing import Iterator


def enable_nan_debugging(infs: bool = True) -> None:
    """Raise (with the failing primitive) whenever a NaN/Inf is produced."""
    import jax

    jax.config.update('jax_debug_nans', True)
    if infs:
        jax.config.update('jax_debug_infs', True)


def disable_nan_debugging() -> None:
    import jax

    jax.config.update('jax_debug_nans', False)
    jax.config.update('jax_debug_infs', False)


@contextlib.contextmanager
def profile_trace(log_dir: str | pathlib.Path) -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    import jax

    log_dir = pathlib.Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight wall-clock step timing with summary statistics."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self) -> 'StepTimer':
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times)
        return {
            'mean_s': float(arr.mean()),
            'p50_s': float(np.percentile(arr, 50)),
            'p95_s': float(np.percentile(arr, 95)),
            'total_s': float(arr.sum()),
            'count': float(len(arr)),
        }
