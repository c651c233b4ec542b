"""Fused Pallas TPU kernel for exact k-nearest-neighbour indices.

Replaces the reference's pykeops ``argKmin`` (src/utils/neighbour_ops.py:77-82)
— and the naive XLA route (materialise the N x N distance matrix in HBM, then
``lax.top_k``, which sorts and costs ~27 ms/call at B=16/N=2048) — with a
VMEM-resident kernel: each distance tile is produced once on-chip and the k
smallest entries per centre are extracted by tournament minima (k is small:
4-25 in every reference config).

Layout: the distance tile is computed TRANSPOSED, ``(N candidates, T
centres)`` — candidates ride the *sublane* axis, centres the lane axis.  The
per-extraction reduction ``min over candidates`` is then a vreg-stack
elementwise min plus one 8-wide sublane tree, and every other extraction op
(hit mask, tournament promotion) is purely elementwise; nothing ever reduces
across lanes.  Measured ~2.0 -> ~1.7 ms per (16, 2048, k=25) call vs the
lane-major variant, before the octo-tournament/self-shortcut below.

The distance uses the MXU with HIGH (bf16x3) precision: ~1e-6 relative error,
far below inter-point distance gaps, so neighbour *selection* is unaffected
while avoiding the 2x cost of full f32 emulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 128
_BIG = 1e30


def _cross_bf16x3(a: Array, b: Array, bf16_fast: bool = False) -> Array:
    """a @ b^T at ~f32 accuracy via three bf16 MXU passes (Mosaic has no
    HIGH-precision lowering; full HIGHEST emulation costs twice as much).

    ``bf16_fast`` (``PCCF_KNN_MXU=bf16``) opts into a single bf16 pass
    (~1e-2 relative error): neighbour selection may flip on near-ties, so it
    is an explicitly-requested speed mode, never the default."""
    dims = (((1,), (1,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims, preferred_element_type=jnp.float32)
    if bf16_fast:
        return dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _env_group() -> int:
    """Interleave depth from the A/B env knobs (read OUTSIDE any jit trace:
    baked-in env reads would make mid-process knob changes silently no-ops).
    Default 4 won the round-4 silicon sweep (tools/sweep_cf.py)."""
    import os

    group = 1 if os.environ.get('PCCF_KNN_NO_PAIR') else int(os.environ.get('PCCF_KNN_GROUP', '4'))
    return max(1, group)


def _env_bf16() -> bool:
    import os

    return os.environ.get('PCCF_KNN_MXU') == 'bf16'


def knn_fits_vmem(n: int) -> bool:
    """Conservative working-set bound: per interleaved chain, the distance
    construction holds ~3 live (N, 128) f32 tiles plus the 8 sorted key
    stacks (another (N, 128)); gate against the default ~16 MB scoped VMEM
    with headroom (the flagship n=2048 uses ~2.5 MB)."""
    pad_n = n + ((-n) % _TILE)
    group = _env_group()
    return (group + 3) * pad_n * _TILE * 4 <= 12 * 2**20


def _knn_kernel(x_ref, idx_ref, *, n: int, k: int, valid_n: int, idx_bits: int,
                group: int, bf16_fast: bool):
    """One batch element: k smallest squared distances per centre (self kNN).

    Packed-key extraction: non-negative f32 bit patterns are order-monotone
    as int32, so the candidate id rides in the low ``idx_bits`` mantissa bits
    and one ``min`` per pass yields value+index together.  Clobbering the low
    mantissa bits perturbs distances by <= 2^-(23-idx_bits) *relative*
    (2.4e-4 at n=2048) — below typical neighbour-gap scales, so selection
    changes only on tie-level gaps, where either neighbour is equally correct
    (ties then break by candidate id; verified: identical neighbour sets on
    random clouds, identical neighbour *distances* on exact-tie grids).

    Octo-tournament extraction: the N candidates split into 8 stacks sorted
    once per column by a 19-comparator network.  Every extraction then needs
    one min over N/8 + a hit mask + 8 promotions — ~1.25 elementwise passes
    over N vs 3 for a naive min+clobber loop (keys are unique, so the single
    hit per column promotes exactly one chain), and the min-reduce chain is
    half as deep as the 4-way variant.

    Self shortcut: the nearest neighbour of a point is itself (d = 0), so the
    diagonal is excluded in the same select pass that masks padding and slot
    0 is emitted directly — only k-1 extractions run.  (On exactly duplicated
    points the golden ``top_k`` may order the duplicate before self; the
    neighbour *set* is identical for k >= 2 since both duplicates qualify.
    k == 1 therefore skips the shortcut and extracts normally.)

    Two-tile interleave: one extraction chain is serial (min -> hit ->
    promote -> next min), which leaves the VPU latency-bound.  When the tile
    count is even, each loop body runs TWO independent centre tiles with
    their extraction steps interleaved, so the scheduler can overlap the two
    chains."""
    x = x_ref[...]  # (N, C)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (N, 1)
    n_tiles = n // _TILE
    cand_ids = jax.lax.broadcasted_iota(jnp.int32, (n, _TILE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (n, _TILE), 1)
    mask = (1 << idx_bits) - 1
    int_max = jnp.iinfo(jnp.int32).max
    net8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7), (1, 2), (5, 6),
            (0, 4), (1, 5), (2, 6), (3, 7), (1, 4), (3, 6), (2, 4), (3, 5), (3, 4)]

    # k == 1: the golden top_k returns the lowest-index zero-distance point,
    # which on exact duplicates need not be self — run a plain extraction
    # (self stays a candidate) so the neighbour matches the golden exactly.
    self_shortcut = k > 1
    n_extract = k - 1 if self_shortcut else k

    def make_chain(t):
        """Distance tile + octo-sort for centre tile ``t``; returns the
        sorted stacks and the slot-0 output list."""
        xt = x_ref[pl.ds(t * _TILE, _TILE), :]  # (T, C) centres
        xt_sq = jnp.sum(xt * xt, axis=-1)[None, :]  # (1, T)
        cross = _cross_bf16x3(x, xt, bf16_fast)  # (N, T): candidate-major
        d = x_sq - 2.0 * cross + xt_sq
        centres = lane_ids + t * _TILE
        # mask padded candidates AND (for the shortcut) the self diagonal
        keep = cand_ids < valid_n
        if self_shortcut:
            keep = keep & (cand_ids != centres)
        d = jnp.where(keep, d, _BIG)
        key = (jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32) & ~mask) | cand_ids
        eighth = n // 8
        q = [key[i * eighth : (i + 1) * eighth] for i in range(8)]
        for a, b in net8:
            q[a], q[b] = jnp.minimum(q[a], q[b]), jnp.maximum(q[a], q[b])
        outs = [centres[:1, :]] if self_shortcut else []  # slot 0: self
        return q, outs

    def extract_step(q, outs):
        m = jnp.min(q[0], axis=0, keepdims=True)  # (1, T)
        outs.append(m & mask)
        hit = q[0] == m
        for i in range(7):
            q[i] = jnp.where(hit, q[i + 1], q[i])
        q[7] = jnp.where(hit, int_max, q[7])

    # Interleave depth: how many independent centre-tile extraction chains
    # run per loop step (the serial min->hit->promote chain is latency-bound;
    # interleaving lets the VPU overlap them).  The value arrives as a static
    # kernel parameter (read from the env by the knn_tpu wrapper).
    while n_tiles % group:
        group //= 2

    def tile_body(t, _):
        chains = [make_chain(group * t + j) for j in range(group)]
        for _j in range(n_extract):
            for q, outs in chains:
                extract_step(q, outs)
        for j, (_q, outs) in enumerate(chains):
            tt = group * t + j
            idx_ref[:, pl.ds(tt * _TILE, _TILE)] = jnp.concatenate(outs, axis=0)  # (k, T)
        return _

    jax.lax.fori_loop(0, n_tiles // group, tile_body, None)


def knn_tpu(x: Array, k: int) -> Array:
    """Exact self-kNN indices ``(B, N, k)`` via the fused Pallas kernel.

    The A/B env knobs (PCCF_KNN_GROUP / PCCF_KNN_NO_PAIR / PCCF_KNN_MXU) are
    read here, OUTSIDE the jit trace, and passed as static arguments — so
    changing them mid-process retraces instead of silently reusing the old
    kernel."""
    return _knn_tpu_impl(x, k=k, group=_env_group(), bf16_fast=_env_bf16())


@functools.partial(jax.jit, static_argnames=('k', 'group', 'bf16_fast'))
def _knn_tpu_impl(x: Array, k: int, group: int, bf16_fast: bool) -> Array:
    """Neighbour indices carry no gradient (the reference likewise treats the
    graph as non-differentiable); the input is detached so autodiff never
    tries to linearize through the pallas_call."""
    x = jax.lax.stop_gradient(x)
    b, n, c = x.shape
    pad_n = (-n) % _TILE
    xp = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0))) if pad_n else x
    np_ = xp.shape[1]
    idx_bits = max(1, (np_ - 1).bit_length())
    kernel = functools.partial(
        _knn_kernel, n=np_, k=k, valid_n=n, idx_bits=idx_bits, group=group, bf16_fast=bf16_fast
    )
    idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((None, np_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, k, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, np_), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=int(b * np_ * np_ * (2 * c + 3 * k)),
            bytes_accessed=int(b * np_ * (c * 4 + k * 4)),
            transcendentals=0,
        ),
    )(xp)
    return jnp.transpose(idx, (0, 2, 1))[:, :n, :]
