"""Fused Pallas TPU kernel for bidirectional nearest-neighbour distance.

Replaces the reference CUDA ``NmDistanceKernel``
(external/pytorch_structural_losses/src/nndistance.cu:2-127) with a
VMEM-resident blockwise scan: the full ``(N, M)`` distance matrix is never
materialised in HBM.  For 2048-point clouds both clouds and the running
min/argmin vectors live entirely in VMEM; distance tiles are produced on the
MXU and reduced immediately.

Outputs match :func:`pccf.kernels.ops.nn_distance`; the ``chamfer_tpu``
wrapper adds the reference's analytic backward (NmDistanceGradKernel
semantics composed with the mean/sum reduction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE_N = 128  # rows of the distance tile computed per inner step


def _nn_direction_kernel(x_ref, y_ref, dist_ref, idx_ref, *, n: int):
    """One batch element: per x row, min + argmin of squared distance to y."""
    y = y_ref[...]  # (M, C)
    y_sq = jnp.sum(y * y, axis=-1)[None, :]  # (1, M)
    n_tiles = n // _TILE_N

    def tile_body(t, _):
        x = x_ref[pl.ds(t * _TILE_N, _TILE_N), :]  # (T, C)
        x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (T, 1)
        cross = jax.lax.dot_general(
            x,
            y,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (T, M)
        d = x_sq - 2.0 * cross + y_sq
        dist_ref[pl.ds(t * _TILE_N, _TILE_N), :] = jnp.min(d, axis=-1, keepdims=True)
        idx_ref[pl.ds(t * _TILE_N, _TILE_N), :] = jnp.argmin(d, axis=-1)[:, None].astype(jnp.int32)
        return _

    jax.lax.fori_loop(0, n_tiles, tile_body, None)


def _nn_direction(x: Array, y: Array) -> tuple[Array, Array]:
    """dist (B, N), idx (B, N): nearest point of y for each x point."""
    b, n, c = x.shape
    m = y.shape[1]
    pad_n = (-n) % _TILE_N
    if pad_n:
        x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0)))  # padded rows dropped below
    np_ = x.shape[1]
    kernel = functools.partial(_nn_direction_kernel, n=np_)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, np_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, np_, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, np_, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, np_, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(b * np_ * m * (2 * c + 3)),
            bytes_accessed=int(b * (np_ + m) * c * 4 + b * np_ * 8),
            transcendentals=0,
        ),
    )(x, y)
    return dist[:, :n, 0], idx[:, :n, 0]


def nn_distance_tpu(x: Array, y: Array) -> tuple[Array, Array, Array, Array]:
    """Pallas TPU version of :func:`pccf.kernels.ops.nn_distance`."""
    d1, i1 = _nn_direction(x, y)
    d2, i2 = _nn_direction(y, x)
    return d1, i1, d2, i2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chamfer_tpu(x: Array, y: Array, reduction: str = 'mean') -> Array:
    """Chamfer distance per batch element via the fused Pallas NN kernel."""
    d1, _, d2, _ = nn_distance_tpu(x, y)
    red = jnp.mean if reduction == 'mean' else jnp.sum
    return red(d1, axis=1) + red(d2, axis=1)


def _chamfer_fwd(x, y, reduction):
    d1, i1, d2, i2 = nn_distance_tpu(x, y)
    red = jnp.mean if reduction == 'mean' else jnp.sum
    return red(d1, axis=1) + red(d2, axis=1), (x, y, i1, i2)


def _chamfer_bwd(reduction, res, g):
    x, y, i1, i2 = res
    n, m = x.shape[1], y.shape[1]
    scale1 = 1.0 / n if reduction == 'mean' else 1.0
    scale2 = 1.0 / m if reduction == 'mean' else 1.0
    g = g[:, None, None]
    ny = jnp.take_along_axis(y, i1[..., None], axis=1)  # (B, N, C) nearest y per x
    nx = jnp.take_along_axis(x, i2[..., None], axis=1)  # (B, M, C) nearest x per y
    gx1 = 2.0 * scale1 * (x - ny) * g
    gy2 = 2.0 * scale2 * (y - nx) * g
    # scatter the matched-point contributions (XLA scatter-add)
    gy1 = jnp.zeros_like(y).at[jnp.arange(y.shape[0])[:, None], i1].add(-gx1)
    gx2 = jnp.zeros_like(x).at[jnp.arange(x.shape[0])[:, None], i2].add(-gy2)
    return gx1 + gx2, gy1 + gy2


chamfer_tpu.defvjp(_chamfer_fwd, _chamfer_bwd)
