"""Fused Pallas TPU kernel for bidirectional nearest-neighbour distance.

Replaces the reference CUDA ``NmDistanceKernel``
(external/pytorch_structural_losses/src/nndistance.cu:2-127, launched twice
— once per direction) with a **single** VMEM-resident blockwise scan: each
MXU distance tile feeds the row-side min/argmin *and* the running
column-side min/argmin, so the quadratic object is produced once per pair
instead of twice and never touches HBM.

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

from pccf.kernels import _chamfer_fold

Array = jax.Array

_TILE_N = 128  # rows of the distance tile computed per inner step


def _nn_both_kernel(x_ref, yt_ref, d1_ref, i1_ref, d2_ref, i2_ref, *, n: int, valid_n: int):
    """One batch element: min/argmin over both axes from shared tiles."""
    c_dim, m = yt_ref.shape
    n_tiles = n // _TILE_N

    _chamfer_fold.fold_init(d2_ref, i2_ref, m)

    def tile_body(t, _):
        x = x_ref[pl.ds(t * _TILE_N, _TILE_N), :]  # (T, C)
        # exact f32 elementwise expansion (faster than HIGHEST MXU emulation)
        d = jnp.zeros((_TILE_N, m), jnp.float32)
        for c in range(c_dim):
            diff = x[:, c : c + 1] - yt_ref[c : c + 1, :]
            d = d + diff * diff
        # row side + running column side (padded rows masked out)
        _chamfer_fold.fold_tile(
            d, t * _TILE_N, d1_ref, i1_ref, d2_ref, i2_ref, valid_n=valid_n
        )
        return _

    jax.lax.fori_loop(0, n_tiles, tile_body, None)


def chamfer_fits_vmem(n: int, m: int) -> bool:
    """Conservative VMEM bound for the fused scan: both clouds (+ the
    transposed y) stay resident and each inner step materialises a
    (_TILE_N, M) f32 distance tile plus min/argmin transients — gate against
    the default ~16 MB scoped VMEM with headroom (the flagship
    n = m = 2048 uses ~3.3 MB)."""
    tile = _TILE_N * m * 4 * 3
    resident = (n + m) * 4 * 4 + (n + m) * 8
    return tile + resident <= 12 * 2**20


@jax.custom_vjp
def nn_distance_tpu(x: Array, y: Array) -> tuple[Array, Array, Array, Array]:
    """Pallas TPU version of :func:`pccf.kernels.ops.nn_distance`.

    dist1/idx1: nearest y for each x; dist2/idx2: nearest x for each y —
    both directions from one pass over the distance tiles.  Differentiable
    like the golden (analytic distance gradients, indices held constant) —
    without the VJP the dispatched op would silently change from
    differentiable to not by backend.
    """
    return _nn_distance_raw(x, y)


def _nn_distance_raw(x: Array, y: Array) -> tuple[Array, Array, Array, Array]:
    b, n, c = x.shape
    m = y.shape[1]
    pad_n = (-n) % _TILE_N
    xp = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0))) if pad_n else x
    np_ = xp.shape[1]
    kernel = functools.partial(_nn_both_kernel, n=np_, valid_n=n)
    cham_specs, cham_shapes = _chamfer_fold.fold_out_specs(b, np_, m)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, np_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, c, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(cham_specs),
        out_shape=tuple(cham_shapes),
        cost_estimate=pl.CostEstimate(
            flops=int(b * np_ * m * (2 * c + 5)),
            bytes_accessed=int(b * (np_ + m) * c * 4 + b * (np_ + m) * 8),
            transcendentals=0,
        ),
    )(xp, jnp.swapaxes(y, 1, 2))
    return d1[:, :n, 0], i1[:, :n, 0], d2[:, 0, :], i2[:, 0, :]


def _nnd_fwd(x, y):
    out = _nn_distance_raw(x, y)
    return out, (x, y, out[1], out[3])


def _nnd_bwd(res, g):
    # d1_i = ||x_i - y[i1_i]||², d2_j = ||y_j - x[i2_j]||²; indices constant
    # (Danskin) — identical to the golden ops.nn_distance gradients.
    x, y, i1, i2 = res
    g1, _, g2, _ = g  # idx cotangents are symbolic zeros
    ny = jnp.take_along_axis(y, i1[..., None], axis=1)  # (B, N, C)
    nx = jnp.take_along_axis(x, i2[..., None], axis=1)  # (B, M, C)
    gx1 = 2.0 * (x - ny) * g1[..., None]
    gy2 = 2.0 * (y - nx) * g2[..., None]
    gy1 = jnp.zeros_like(y).at[jnp.arange(y.shape[0])[:, None], i1].add(-gx1)
    gx2 = jnp.zeros_like(x).at[jnp.arange(x.shape[0])[:, None], i2].add(-gy2)
    return gx1 + gx2, gy1 + gy2


nn_distance_tpu.defvjp(_nnd_fwd, _nnd_bwd)


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
