"""Shared chamfer fold: row/col min+argmin accumulated from distance tiles.

Three Pallas kernels emit the bidirectional nearest-neighbour structure that
backs the chamfer loss — the standalone NN kernel (``pallas_chamfer``) and
the fused composite-loss kernels (``pallas_emd``, ``pallas_sinkhorn``), which
let chamfer ride the (N, M) d2 sweep they compute anyway.  This module holds
the single definition of the fold so tie-breaking, the column-side sentinel,
and the output layout stay identical to :func:`pccf.kernels.ops.nn_distance`
in all three (reference semantics: nndistance.cu min/argmin per direction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Column-side running-min sentinel.  Coordinates whose squared distances all
# exceed 1e30 (|x| >~ 6e14) would leave every column pinned to row 0 —
# unreachable for the normalised clouds every in-repo consumer feeds; the
# goldens in ops.nn_distance have no such bound.
BIG = 1e30


def fold_init(dc2_ref, ic2_ref, m: int) -> None:
    """Initialise the running column-side min/argmin refs ((1, M) each)."""
    dc2_ref[...] = jnp.full((1, m), BIG, jnp.float32)
    ic2_ref[...] = jnp.zeros((1, m), jnp.int32)


def fold_tile(d2, row_start, d1_ref, i1_ref, dc2_ref, ic2_ref, *, valid_n=None, rowmin=None):
    """Fold one ``(T, M)`` distance tile into both chamfer sides.

    Row side: stores min/argmin for rows ``[row_start, row_start + T)``.
    Column side: updates the running min/argmin; strict ``<`` keeps the
    lowest row index on ties, matching ``jnp.argmin`` over the full matrix.
    ``valid_n`` masks padded rows out of the column side; ``rowmin`` lets a
    caller that already needs the row minimum (the Sinkhorn Gibbs-kernel
    stabiliser) share it.  Returns the row minimum ``(T, 1)``.
    """
    tile = d2.shape[0]
    if rowmin is None:
        rowmin = jnp.min(d2, axis=-1, keepdims=True)
    d1_ref[pl.ds(row_start, tile), :] = rowmin
    i1_ref[pl.ds(row_start, tile), :] = jnp.argmin(d2, axis=-1)[:, None].astype(jnp.int32)
    if valid_n is not None:
        row_ids = row_start + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        d2 = jnp.where(row_ids < valid_n, d2, BIG)
    tile_min = jnp.min(d2, axis=0, keepdims=True)  # (1, M)
    tile_arg = (row_start + jnp.argmin(d2, axis=0)[None, :]).astype(jnp.int32)
    better = tile_min < dc2_ref[...]
    dc2_ref[...] = jnp.where(better, tile_min, dc2_ref[...])
    ic2_ref[...] = jnp.where(better, tile_arg, ic2_ref[...])
    return rowmin


def fold_out_specs(b: int, n: int, m: int):
    """``(out_specs, out_shape)`` for the four chamfer outputs d1, i1, d2, i2."""
    specs = [
        pl.BlockSpec((None, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    shapes = [
        jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, n, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
    ]
    return specs, shapes
