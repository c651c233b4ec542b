"""Fused Pallas TPU kernel for graph max-pooling (gather rows + max over k).

TPU-native replacement for the reference's pykeops/torch neighbour pooling
(src/utils/neighbour_ops.py:106-119 ``graph_max_pooling`` /
``get_graph_features``): XLA's TPU row-gather is index-processing-bound
(~70 GB/s regardless of dtype), and DGCNN-family encoders spend ~75% of
their time in it.  This kernel keeps the feature matrix VMEM-resident and
drives dynamic row reads from the neighbour indices in SMEM, reducing
``max_j x[idx[n, j]]`` in-register — measured 6.1x faster than the XLA
``take_along_axis`` + ``max`` route at the canonical (16, 2048, 25, 128)
workload (1.2 ms vs 7.2 ms), bit-exact.

The backward passes (training) are the transposed problem — scatter-adds of
cotangent rows to neighbour rows.  XLA's TPU scatter processes indices
near-serially at element granularity (measured ~100 ms of a 170 ms VQ-VAE
train step, tools/profile_train.py round 4), so the backwards are Pallas
kernels too: dynamic row read-modify-writes into a VMEM-resident (N, C)
accumulator, the mirror image of the gather forward.  The max-pool forward
records each channel's winning neighbour SLOT so its backward is a
slot-masked row scatter (k row RMWs per centre instead of an elementwise
scatter).  Grid steps are sequential on a TensorCore, so in-place
accumulation across tiles is race-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE_N = 256
_VMEM_BUDGET = int(100e6)


def gather_pool_supported(n: int, c: int, k: int = 0) -> bool:
    """True when (N, C) features fit the kernel's VMEM residency + tiling.

    ``k``: the gather kernel's output block is (k, 256, C) ON TOP of the
    resident (N, C) feature tile, so its VMEM footprint scales with the
    neighbour count; pass ``idx.shape[-1]`` when gating the gather. The pool
    kernels write a k-independent (256, C) block and pass no k."""
    return n % _TILE_N == 0 and n * c * 4 * 3 + k * _TILE_N * c * 4 <= _VMEM_BUDGET


def _unroll() -> int:
    """Independent rows per loop step: overlaps the dynamic-row loads (the
    per-row max chain is latency-bound; 4-way row ILP measured ~1.5-2x,
    8-way won the round-4 silicon sweep, tools/sweep_cf.py).
    PCCF_POOL_UNROLL overrides for on-chip A/B — read at TRACE time (not
    module import), so a probe that changes the knob and rebuilds its jit
    actually measures the new value; clamped to the nearest power-of-two
    divisor of _TILE_N (a non-divisor unroll would leave tail rows of each
    output tile unwritten)."""
    import os

    u = max(1, int(os.environ.get('PCCF_POOL_UNROLL', '8')))
    while _TILE_N % u:
        u //= 2
    return u


def _pool_kernel(idx_ref, x_ref, out_ref, *, tile: int, k: int, unroll: int):
    def body(i0, _):
        for u in range(unroll):
            i = i0 * unroll + u
            row = x_ref[pl.ds(idx_ref[i, 0], 1), :]
            for j in range(1, k):
                row = jnp.maximum(row, x_ref[pl.ds(idx_ref[i, j], 1), :])
            out_ref[pl.ds(i, 1), :] = row
        return _

    jax.lax.fori_loop(0, tile // unroll, body, None)


def _pool_forward(x: Array, idx: Array) -> Array:
    b, n, c = x.shape
    k = idx.shape[-1]
    return pl.pallas_call(
        functools.partial(_pool_kernel, tile=_TILE_N, k=k, unroll=_unroll()),
        grid=(b, n // _TILE_N),
        in_specs=[
            pl.BlockSpec((None, _TILE_N, k), lambda i, t: (i, t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, n, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, _TILE_N, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(idx.astype(jnp.int32), x)


def _pool_src_kernel(idx_ref, x_ref, out_ref, src_ref, *, tile: int, k: int, unroll: int):
    """Max-pool that also records the argmax *slot* (0..k-1) per channel, so
    the backward is a slot-masked row scatter (no (B, N, k, C) re-gather).
    Ties keep the earliest neighbour slot, matching ``argmax``-first
    semantics."""

    def body(i0, _):
        for u in range(unroll):
            i = i0 * unroll + u
            row = x_ref[pl.ds(idx_ref[i, 0], 1), :]
            src = jnp.zeros(row.shape, jnp.int32)
            for j in range(1, k):
                cand = x_ref[pl.ds(idx_ref[i, j], 1), :]
                upd = cand > row
                row = jnp.where(upd, cand, row)
                src = jnp.where(upd, j, src)
            out_ref[pl.ds(i, 1), :] = row
            src_ref[pl.ds(i, 1), :] = src
        return _

    jax.lax.fori_loop(0, tile // unroll, body, None)


def _pool_src_forward(x: Array, idx: Array) -> tuple[Array, Array]:
    b, n, c = x.shape
    k = idx.shape[-1]
    spec = pl.BlockSpec((None, _TILE_N, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pool_src_kernel, tile=_TILE_N, k=k, unroll=_unroll()),
        grid=(b, n // _TILE_N),
        in_specs=[
            pl.BlockSpec((None, _TILE_N, k), lambda i, t: (i, t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, n, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, n, c), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(idx.astype(jnp.int32), x)


def _scatter_add_kernel(idx_ref, g_ref, out_ref, *, tile: int, k: int, unroll: int):
    """``dx[idx[i, j], :] += g[i, :]`` — row RMWs into the VMEM-resident
    (N, C) accumulator, zeroed on the first tile of each batch element."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i0, _):
        for u in range(unroll):
            i = i0 * unroll + u
            g = g_ref[pl.ds(i, 1), :]
            for j in range(k):
                r = idx_ref[i, j]
                out_ref[pl.ds(r, 1), :] += g
        return _

    jax.lax.fori_loop(0, tile // unroll, body, None)


def _scatter_slot_kernel(idx_ref, slot_ref, g_ref, out_ref, *, tile: int, k: int, unroll: int):
    """Max-pool backward: ``dx[idx[i, j], c] += g[i, c]`` where channel c's
    winning slot is j — k slot-masked row RMWs per centre."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i0, _):
        for u in range(unroll):
            i = i0 * unroll + u
            g = g_ref[pl.ds(i, 1), :]
            s = slot_ref[pl.ds(i, 1), :]
            for j in range(k):
                r = idx_ref[i, j]
                out_ref[pl.ds(r, 1), :] += jnp.where(s == j, g, 0.0)
        return _

    jax.lax.fori_loop(0, tile // unroll, body, None)


def _scatter_add_rows(g: Array, idx: Array, n: int) -> Array:
    """Transpose of the row gather: ``dx (B, n, C)`` accumulating ``g`` rows
    at ``idx`` rows.  ``g``: (B, M, C); ``idx``: (B, M, k)."""
    b, m, c = g.shape
    k = idx.shape[-1]
    return pl.pallas_call(
        functools.partial(_scatter_add_kernel, tile=_TILE_N, k=k, unroll=_unroll()),
        grid=(b, m // _TILE_N),
        in_specs=[
            pl.BlockSpec((None, _TILE_N, k), lambda i, t: (i, t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, _TILE_N, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), g.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(idx.astype(jnp.int32), g)


def _scatter_add_slots(g: Array, idx: Array, slots: Array, n: int) -> Array:
    b, m, c = g.shape
    k = idx.shape[-1]
    return pl.pallas_call(
        functools.partial(_scatter_slot_kernel, tile=_TILE_N, k=k, unroll=_unroll()),
        grid=(b, m // _TILE_N),
        in_specs=[
            pl.BlockSpec((None, _TILE_N, k), lambda i, t: (i, t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, _TILE_N, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _TILE_N, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), g.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(idx.astype(jnp.int32), slots, g)


@jax.custom_vjp
def graph_max_pool_tpu(x: Array, idx: Array) -> Array:
    """``max_j x[b, idx[b, n, j], :]`` — Pallas forward, scatter backward."""
    return _pool_forward(x, idx)


def _pool_fwd(x, idx):
    out, slots = _pool_src_forward(x, idx)
    return out, (x.shape, idx, slots)


def _pool_bwd(res, g):
    shape, idx, slots = res
    n, c = shape[1], shape[2]
    if gather_pool_supported(n, c) and g.shape[1] % _TILE_N == 0:
        return _scatter_add_slots(g, idx, slots, n), None
    rows = jnp.take_along_axis(idx, slots, axis=2)  # (B, M, C): winning row per channel
    bidx = jnp.arange(shape[0])[:, None, None]
    cidx = jnp.arange(c)[None, None, :]
    dx = jnp.zeros(shape, g.dtype).at[bidx, rows, cidx].add(g)
    return dx, None


graph_max_pool_tpu.defvjp(_pool_fwd, _pool_bwd)


def _sum_pool_kernel(idx_ref, x_ref, out_ref, *, tile: int, k: int, unroll: int):
    def body(i0, _):
        for u in range(unroll):
            i = i0 * unroll + u
            row = x_ref[pl.ds(idx_ref[i, 0], 1), :]
            for j in range(1, k):
                row = row + x_ref[pl.ds(idx_ref[i, j], 1), :]
            out_ref[pl.ds(i, 1), :] = row
        return _

    jax.lax.fori_loop(0, tile // unroll, body, None)


def _sum_pool_forward(x: Array, idx: Array) -> Array:
    b, n, c = x.shape
    k = idx.shape[-1]
    return pl.pallas_call(
        functools.partial(_sum_pool_kernel, tile=_TILE_N, k=k, unroll=_unroll()),
        grid=(b, n // _TILE_N),
        in_specs=[
            pl.BlockSpec((None, _TILE_N, k), lambda i, t: (i, t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, n, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, _TILE_N, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(idx.astype(jnp.int32), x)


@jax.custom_vjp
def graph_sum_pool_tpu(x: Array, idx: Array) -> Array:
    """``sum_j x[b, idx[b, n, j], :]`` — Pallas forward, scatter-add backward."""
    return _sum_pool_forward(x, idx)


def _sum_pool_fwd(x, idx):
    return _sum_pool_forward(x, idx), (x.shape, idx)


def _sum_pool_bwd(res, g):
    shape, idx = res
    n, c = shape[1], shape[2]
    if gather_pool_supported(n, c) and g.shape[1] % _TILE_N == 0:
        return _scatter_add_rows(g, idx, n), None
    b = jnp.arange(shape[0])[:, None, None]
    gk = jnp.broadcast_to(g[:, :, None, :], (*idx.shape, shape[-1]))
    dx = jnp.zeros(shape, g.dtype).at[b, idx, :].add(gk)
    return dx, None


graph_sum_pool_tpu.defvjp(_sum_pool_fwd, _sum_pool_bwd)


def _gather_kernel(idx_ref, x_ref, out_ref, *, tile: int, k: int, unroll: int):
    def body(i0, _):
        for u in range(unroll):
            i = i0 * unroll + u
            for j in range(k):
                out_ref[j, pl.ds(i, 1), :] = x_ref[pl.ds(idx_ref[i, j], 1), :]
        return _

    jax.lax.fori_loop(0, tile // unroll, body, None)


def _gather_forward(x: Array, idx: Array) -> Array:
    b, n, c = x.shape
    k = idx.shape[-1]
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile=_TILE_N, k=k, unroll=_unroll()),
        grid=(b, n // _TILE_N),
        in_specs=[
            pl.BlockSpec((None, _TILE_N, k), lambda i, t: (i, t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, n, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, k, _TILE_N, c), lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, k, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(idx.astype(jnp.int32), x)
    return jnp.transpose(out, (0, 2, 1, 3))  # (B, N, k, C)


@jax.custom_vjp
def gather_neighbors_tpu(x: Array, idx: Array) -> Array:
    """``x[b, idx[b, n, j], :]`` -> (B, N, k, C) — Pallas row gather.

    Same contract as :func:`pccf.kernels.ops.gather_neighbors`; the XLA TPU
    gather is index-processing-bound, this kernel reads VMEM-resident rows."""
    return _gather_forward(x, idx)


def _gather_fwd(x, idx):
    return _gather_forward(x, idx), (x.shape, idx)


def _gather_bwd(res, g):
    shape, idx = res
    bsz, n, c = shape
    k = idx.shape[-1]
    if gather_pool_supported(n, c) and (g.shape[1] * k) % _TILE_N == 0:
        # flatten (centre, slot) to rows: a k=1 row scatter over N*k rows
        gf = g.reshape(bsz, -1, c)
        idxf = idx.reshape(bsz, -1, 1)
        return _scatter_add_rows(gf, idxf, n), None
    b = jnp.arange(shape[0])[:, None, None]
    dx = jnp.zeros(shape, g.dtype).at[b, idx, :].add(g)
    return dx, None


gather_neighbors_tpu.defvjp(_gather_fwd, _gather_bwd)
