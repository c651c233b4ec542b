"""Dispatching kernel API: Pallas TPU kernels with jnp fallback.

Mirrors the reference's dual-backend pattern (pykeops on CUDA / torch on CPU,
src/utils/neighbour_ops.py:27-33): on TPU the fused Pallas kernels run; on
CPU (tests, virtual meshes) the pure-jnp golden implementations run.

Backend override: ``PCCF_KERNEL_BACKEND`` env var ('pallas' | 'jnp' | 'auto'),
or — taking precedence, and scoped to the calling thread — the
:func:`force_backend` context manager.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax

from pccf.kernels import ops

Array = jax.Array

# thread-scoped override: contextvars give each thread its own value, so a
# trace pinned by force_backend (e.g. pccf.export targeting another platform)
# cannot poison a concurrent trace in a serving thread the way mutating the
# process-global env var would
_FORCED_BACKEND: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    'pccf_kernel_backend', default=None
)


@contextlib.contextmanager
def force_backend(mode: str):
    """Pin kernel dispatch to ``'pallas'`` | ``'jnp'`` | ``'auto'`` for the
    calling thread until the ``with`` block exits."""
    if mode not in ('pallas', 'jnp', 'auto'):
        raise ValueError(f'unknown kernel backend {mode!r}')
    token = _FORCED_BACKEND.set(mode)
    try:
        yield
    finally:
        _FORCED_BACKEND.reset(token)


def _use_pallas() -> bool:
    mode = _FORCED_BACKEND.get() or os.environ.get('PCCF_KERNEL_BACKEND', 'auto')
    if mode == 'pallas':
        return True
    if mode == 'jnp':
        return False
    # allowlist, not "anything but cpu": a GPU/Metal jax would crash in the
    # Mosaic TPU lowering where the jnp fallback works ('axon' is the
    # experimental remote-TPU platform this machine tunnels through)
    return jax.default_backend() in ('tpu', 'axon')


def use_pallas() -> bool:
    """Public backend predicate: True when the Pallas TPU kernels dispatch."""
    return _use_pallas()


def chamfer(x: Array, y: Array, reduction: str = 'mean') -> Array:
    """Chamfer distance ``(B,)`` — Pallas on TPU, jnp elsewhere."""
    if _use_pallas() and x.shape[1] % 256 == 0 and y.shape[1] % 256 == 0:
        from pccf.kernels.pallas_chamfer import chamfer_fits_vmem, chamfer_tpu

        if chamfer_fits_vmem(x.shape[1], y.shape[1]):
            return chamfer_tpu(x, y, reduction)
    return ops.chamfer(x, y, reduction=reduction)


def match_cost(x: Array, y: Array) -> Array:
    """ApproxMatch EMD ``(B,)`` — fused Pallas kernel on TPU, jnp elsewhere.

    The Pallas kernel keeps three f32 ``(N, M)`` caches VMEM-resident, so it
    dispatches only when they fit (always true for the reference's canonical
    2048-point workloads); larger clouds fall back to the jnp path."""
    if _use_pallas() and x.shape[1] % 512 == 0 and y.shape[1] % 128 == 0:
        from pccf.kernels.pallas_emd import emd_fits_vmem, match_cost_tpu

        if emd_fits_vmem(x.shape[1], y.shape[1]):
            return match_cost_tpu(x, y)
    return ops.match_cost(x, y)


def chamfer_match_cost(x: Array, y: Array, reduction: str = 'mean') -> tuple[Array, Array]:
    """``(chamfer (B,), emd (B,))`` sharing one distance sweep on TPU.

    The ChamferEMD composite evaluates both metrics on the same pair; the
    fused Pallas kernel emits chamfer's min/argmin from the d2 sweep the EMD
    relaxation caches anyway, saving the standalone chamfer launch.  Falls
    back to the two separate (golden) calls off-TPU or when the EMD caches
    would not fit VMEM."""
    if _use_pallas() and x.shape[1] % 512 == 0 and y.shape[1] % 128 == 0:
        from pccf.kernels.pallas_emd import chamfer_match_cost_tpu, emd_fits_vmem

        if emd_fits_vmem(x.shape[1], y.shape[1]):
            return chamfer_match_cost_tpu(x, y, reduction)
    # Per-term dispatchers, not ops.*: when only the fused gate fails (e.g.
    # n=4096 exceeds the EMD VMEM budget) the chamfer term still gets its
    # own Pallas kernel.
    return chamfer(x, y, reduction=reduction), match_cost(x, y)


def sinkhorn_cost(x: Array, y: Array) -> Array:
    """Sinkhorn EMD surrogate ``(B,)`` — opt-in alternative matcher to
    ApproxMatch (no reference counterpart).  Fused Pallas kernel on TPU
    (d2 + Gibbs kernel VMEM-resident, plan never materialised), jnp
    elsewhere.  Backward follows the ``match_cost`` contract (plan held
    constant)."""
    if _use_pallas() and x.shape[1] % 512 == 0 and y.shape[1] % 128 == 0:
        from pccf.kernels.pallas_sinkhorn import sinkhorn_cost_tpu, sinkhorn_fits_vmem

        if sinkhorn_fits_vmem(x.shape[1], y.shape[1]):
            return sinkhorn_cost_tpu(x, y)
    return ops.sinkhorn_cost(x, y)


def chamfer_sinkhorn_cost(x: Array, y: Array, reduction: str = 'mean') -> tuple[Array, Array]:
    """``(chamfer (B,), sinkhorn (B,))`` sharing one distance sweep on TPU
    (same fusion as :func:`chamfer_match_cost`; chamfer's d1 is the Gibbs
    kernel's row stabiliser)."""
    if _use_pallas() and x.shape[1] % 512 == 0 and y.shape[1] % 128 == 0:
        from pccf.kernels.pallas_sinkhorn import chamfer_sinkhorn_cost_tpu, sinkhorn_fits_vmem

        if sinkhorn_fits_vmem(x.shape[1], y.shape[1]):
            return chamfer_sinkhorn_cost_tpu(x, y, reduction)
    return chamfer(x, y, reduction=reduction), sinkhorn_cost(x, y)


def knn(x: Array, k: int, *, approx: bool = False) -> Array:
    """Self-kNN indices ``(B, N, k)`` — fused Pallas kernel on TPU (~9x the
    XLA materialise+top_k route), jnp elsewhere."""
    if approx:
        return ops.knn(x, k, approx=True)
    if _use_pallas() and k <= 128 and x.shape[1] >= 128:
        from pccf.kernels.pallas_knn import knn_fits_vmem, knn_tpu

        if knn_fits_vmem(x.shape[1]):
            return knn_tpu(x, k)
    return ops.knn(x, k)


def graph_max_pool(x: Array, idx: Array) -> Array:
    """Max over the k gathered neighbours ``(B, N, C)`` — Pallas kernel on
    TPU (6x the XLA gather route, which is index-processing-bound), jnp
    elsewhere."""
    if _use_pallas():
        from pccf.kernels.pallas_gather import gather_pool_supported, graph_max_pool_tpu

        if gather_pool_supported(x.shape[1], x.shape[2]):
            return graph_max_pool_tpu(x, idx)
    return ops.graph_max_pool(x, idx)


def graph_sum_pool(x: Array, idx: Array) -> Array:
    """Sum over the k gathered neighbours ``(B, N, C)`` — streaming Pallas
    kernel on TPU (no (B, N, k, C) materialisation), jnp elsewhere."""
    if _use_pallas():
        from pccf.kernels.pallas_gather import gather_pool_supported, graph_sum_pool_tpu

        if gather_pool_supported(x.shape[1], x.shape[2]):
            return graph_sum_pool_tpu(x, idx)
    return ops.graph_sum_pool(x, idx)


def gather_neighbors(x: Array, idx: Array) -> Array:
    """Neighbour features ``(B, N, k, C)`` — Pallas row gather on TPU."""
    if _use_pallas():
        from pccf.kernels.pallas_gather import gather_pool_supported, gather_neighbors_tpu

        if gather_pool_supported(x.shape[1], x.shape[2], idx.shape[-1]):
            return gather_neighbors_tpu(x, idx)
    return ops.gather_neighbors(x, idx)


def graph_filtering(x: Array, k: int = 4) -> Array:
    """PCGen output sharpening with the dispatched kNN backend."""
    idx = knn(x, k)
    return ops.graph_filtering_with_idx(x, idx, gather_fn=gather_neighbors)


def nn_distance(x: Array, y: Array):
    """Bidirectional NN distances (dist1, idx1, dist2, idx2)."""
    if _use_pallas() and x.shape[1] % 256 == 0 and y.shape[1] % 256 == 0:
        from pccf.kernels.pallas_chamfer import chamfer_fits_vmem, nn_distance_tpu

        if chamfer_fits_vmem(x.shape[1], y.shape[1]):
            return nn_distance_tpu(x, y)
    return ops.nn_distance(x, y)
