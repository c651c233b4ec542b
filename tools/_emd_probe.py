"""On-chip A/B probe for ApproxMatch EMD kernel variants.

Variants (vs the mainline ``pccf.kernels.pallas_emd``):

- ``nokc``: drop the per-level kernel-matrix cache; phase 3 recomputes the
  previous level's ``exp2(level * d2)`` instead of re-reading it.  Cuts the
  per-sweep VMEM-resident traffic from ~20 B/elem to ~12 B/elem at the cost
  of one extra exp2 — a win iff the sweeps are VMEM-bandwidth-bound.
- ``pair2``: ``nokc`` plus two batch pairs per kernel instance with their
  sweeps interleaved tile-by-tile — two independent reduction/exp chains per
  basic block, a win iff the sweeps are latency-bound.
- ``bf16s``: ``nokc`` with the accumulated winv stored bf16 (12 -> 8 B/elem;
  0.4% grad error, interpret-checked).  d2/exp2/ratios must stay f32 — the
  sharp levels amplify d2 quantization exponentially and the grad
  cancellation amplifies W/x2 quantization ~10x (both measured; see the
  kernel docstring).

Usage:
  python _emd_probe.py check   # interpret-mode numeric check vs golden (CPU)
  python _emd_probe.py bench   # on-chip timing A/B (real TPU)
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import numpy as np

if 'check' in sys.argv:
    import os

    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax

    jax.config.update('jax_platforms', 'cpu')

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pccf.kernels.ops import APPROX_MATCH_LEVELS

_LOG2E = 1.4426950408889634
_TILE = 512
_VMEM_BUDGET = int(100e6)


def _level2(li):
    return -jnp.exp2(14.0 - 2.0 * li.astype(jnp.float32)) * _LOG2E


def _emd_kernel_nokc(
    x1_ref, x2_ref, x2t_ref, cost_ref, grad1_ref, grad2_ref,
    remain_l, ratio_l, remain_r, ratio_r, col_acc, g2_acc, d2c, wacc,
    *, n: int, m: int, mult_l: float, mult_r: float,
):
    x2 = x2_ref[...]
    n_tiles = n // _TILE
    n_levels = len(APPROX_MATCH_LEVELS)
    n2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
    aug2 = jnp.concatenate([x2, n2, jnp.ones((m, 1), jnp.float32)], axis=1)

    remain_l[...] = jnp.full((n, 1), mult_l, jnp.float32)
    remain_r[...] = jnp.full((1, m), mult_r, jnp.float32)
    cost_ref[...] = jnp.zeros((1, 1), jnp.float32)
    g2_acc[...] = jnp.zeros((m, 4), jnp.float32)
    col_acc[...] = jnp.zeros((1, m), jnp.float32)

    def phase12_tile(t, k):
        suml = jnp.sum(k * remain_r[...], axis=1, keepdims=True)
        rl = remain_l[pl.ds(t * _TILE, _TILE), :] / (suml + 1e-9)
        ratio_l[pl.ds(t * _TILE, _TILE), :] = rl
        col_acc[...] += jnp.sum(k * rl, axis=0, keepdims=True)

    def phase3_tile(t, d2, k, first):
        rl = ratio_l[pl.ds(t * _TILE, _TILE), :]
        w = k * rl * ratio_r[...]
        remain_l[pl.ds(t * _TILE, _TILE), :] = jnp.maximum(
            0.0, remain_l[pl.ds(t * _TILE, _TILE), :] - jnp.sum(w, axis=1, keepdims=True)
        )
        winv = w * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
        if first:
            wacc[pl.ds(t * _TILE, _TILE), :] = winv
        else:
            wacc[pl.ds(t * _TILE, _TILE), :] += winv

    def interphase():
        demand = col_acc[...] * remain_r[...]
        consumption = jnp.minimum(remain_r[...] / (demand + 1e-9), 1.0)
        ratio_r[...] = consumption * remain_r[...]
        remain_r[...] = jnp.maximum(0.0, remain_r[...] - demand)
        col_acc[...] = jnp.zeros((1, m), jnp.float32)

    def sweep0(t, _):
        xt = x1_ref[pl.ds(t * _TILE, _TILE), :]
        d2 = jnp.zeros((_TILE, m), jnp.float32)
        for c in range(3):
            diff = xt[:, c : c + 1] - x2t_ref[c : c + 1, :]
            d2 = d2 + diff * diff
        d2c[pl.ds(t * _TILE, _TILE), :] = d2
        phase12_tile(t, jnp.exp2(_level2(jnp.asarray(0.0)) * d2))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep0, None)
    interphase()

    def sweepL(li, _):
        lvl = _level2(li.astype(jnp.float32))
        lvl_prev = _level2(li.astype(jnp.float32) - 1.0)

        def body(t, _):
            d2 = d2c[pl.ds(t * _TILE, _TILE), :]
            phase3_tile(t, d2, jnp.exp2(lvl_prev * d2), first=False)
            phase12_tile(t, jnp.exp2(lvl * d2))
            return _

        def body_first(t, _):
            d2 = d2c[pl.ds(t * _TILE, _TILE), :]
            phase3_tile(t, d2, jnp.exp2(lvl_prev * d2), first=True)
            phase12_tile(t, jnp.exp2(lvl * d2))
            return _

        jax.lax.cond(
            li == 1,
            lambda: jax.lax.fori_loop(0, n_tiles, body_first, None),
            lambda: jax.lax.fori_loop(0, n_tiles, body, None),
        )
        interphase()
        return _

    jax.lax.fori_loop(1, n_levels, sweepL, None)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )

    lvl_last = _level2(jnp.asarray(float(n_levels - 1)))

    def sweep_last(t, _):
        d2 = d2c[pl.ds(t * _TILE, _TILE), :]
        phase3_tile(t, d2, jnp.exp2(lvl_last * d2), first=False)
        wt = wacc[pl.ds(t * _TILE, _TILE), :]
        xt = x1_ref[pl.ds(t * _TILE, _TILE), :]
        row5 = dot(wt, aug2, (((1,), (0,)), ((), ())))
        n1 = jnp.sum(xt * xt, axis=1, keepdims=True)
        contrib = (
            row5[:, 3:4] + n1 * row5[:, 4:5]
            - 2.0 * jnp.sum(xt * row5[:, 0:3], axis=1, keepdims=True)
        )
        cost_ref[...] = cost_ref[...] + jnp.sum(contrib)
        grad1_ref[pl.ds(t * _TILE, _TILE), :] = xt * row5[:, 4:5] - row5[:, 0:3]
        aug = jnp.concatenate([xt, jnp.ones((_TILE, 1), jnp.float32)], axis=1)
        g2_acc[...] += dot(wt, aug, (((0,), (0,)), ((), ())))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep_last, None)
    grad2_ref[...] = x2 * g2_acc[:, 3:4] - g2_acc[:, 0:3]


def _forward_nokc(x1, x2, interpret=False):
    b, n, c = x1.shape
    m = x2.shape[1]
    mult_l, mult_r = (1.0, float(n // m)) if n >= m else (float(m // n), 1.0)
    kernel = functools.partial(_emd_kernel_nokc, n=n, m=m, mult_l=mult_l, mult_r=mult_r)
    cost, grad1, grad2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, c, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((m, 4), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(x1, x2, jnp.swapaxes(x2, 1, 2))
    return cost[:, 0, 0], grad1, grad2


def _emd_kernel_bf16s(
    x1_ref, x2_ref, x2t_ref, cost_ref, grad1_ref, grad2_ref,
    remain_l, ratio_l, remain_r, ratio_r, col_acc, g2_acc, d2c, wacc,
    *, n: int, m: int, mult_l: float, mult_r: float,
):
    """``nokc`` schedule with the accumulated winv stored in bfloat16.

    What must stay f32 (measured on CPU, _dbg study):
    - d2 and the exp2 evaluation — the sharp levels scale d2 by
      -4^7·log2(e) ≈ -23600, so bf16's 0.4% d2 quantization shifts the
      exponent by ±O(10) bits (39% grad error);
    - the k·rl·rr multiply chain — W's 1.2% quantization amplifies to ~13%
      grad error through the x1·rowsum(W) − W@x2 cancellation.
    What CAN be halved: the wacc store/accumulate (bf16: 0.6% grad error,
    measured), which cuts per-sweep traffic from 12 to 8 B/elem under the
    nokc schedule.  An A/B probe for the sweep's bandwidth share
    (BASELINE.md ceiling proof says VPU-compute-bound; this tests it).
    """
    bf = jnp.bfloat16
    f32 = jnp.float32
    x2 = x2_ref[...]
    n_tiles = n // _TILE
    n_levels = len(APPROX_MATCH_LEVELS)
    n2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
    aug2 = jnp.concatenate([x2, n2, jnp.ones((m, 1), f32)], axis=1)

    remain_l[...] = jnp.full((n, 1), mult_l, f32)
    remain_r[...] = jnp.full((1, m), mult_r, f32)
    cost_ref[...] = jnp.zeros((1, 1), f32)
    g2_acc[...] = jnp.zeros((m, 4), f32)
    col_acc[...] = jnp.zeros((1, m), f32)

    def phase12_tile(t, k):
        suml = jnp.sum(k * remain_r[...], axis=1, keepdims=True)
        rl = remain_l[pl.ds(t * _TILE, _TILE), :] / (suml + 1e-9)
        ratio_l[pl.ds(t * _TILE, _TILE), :] = rl
        col_acc[...] += jnp.sum(k * rl, axis=0, keepdims=True)

    def phase3_tile(t, d2, k, first):
        rl = ratio_l[pl.ds(t * _TILE, _TILE), :]
        w = k * rl * ratio_r[...]
        remain_l[pl.ds(t * _TILE, _TILE), :] = jnp.maximum(
            0.0, remain_l[pl.ds(t * _TILE, _TILE), :] - jnp.sum(w, axis=1, keepdims=True)
        )
        winv = w * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
        if first:
            wacc[pl.ds(t * _TILE, _TILE), :] = winv.astype(bf)
        else:
            wacc[pl.ds(t * _TILE, _TILE), :] += winv.astype(bf)

    def interphase():
        demand = col_acc[...] * remain_r[...]
        consumption = jnp.minimum(remain_r[...] / (demand + 1e-9), 1.0)
        ratio_r[...] = consumption * remain_r[...]
        remain_r[...] = jnp.maximum(0.0, remain_r[...] - demand)
        col_acc[...] = jnp.zeros((1, m), f32)

    def kexp(lvl, d2):  # f32 throughout (precision-critical, see docstring)
        return jnp.exp2(lvl * d2)

    def sweep0(t, _):
        xt = x1_ref[pl.ds(t * _TILE, _TILE), :]
        d2 = jnp.zeros((_TILE, m), f32)
        for c in range(3):
            diff = xt[:, c : c + 1] - x2t_ref[c : c + 1, :]
            d2 = d2 + diff * diff
        d2c[pl.ds(t * _TILE, _TILE), :] = d2
        phase12_tile(t, kexp(_level2(jnp.asarray(0.0)), d2))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep0, None)
    interphase()

    def sweepL(li, _):
        lvl = _level2(li.astype(f32))
        lvl_prev = _level2(li.astype(f32) - 1.0)

        def body(t, _):
            d2 = d2c[pl.ds(t * _TILE, _TILE), :]
            phase3_tile(t, d2, kexp(lvl_prev, d2), first=False)
            phase12_tile(t, kexp(lvl, d2))
            return _

        def body_first(t, _):
            d2 = d2c[pl.ds(t * _TILE, _TILE), :]
            phase3_tile(t, d2, kexp(lvl_prev, d2), first=True)
            phase12_tile(t, kexp(lvl, d2))
            return _

        jax.lax.cond(
            li == 1,
            lambda: jax.lax.fori_loop(0, n_tiles, body_first, None),
            lambda: jax.lax.fori_loop(0, n_tiles, body, None),
        )
        interphase()
        return _

    jax.lax.fori_loop(1, n_levels, sweepL, None)

    def dot(a, b, dims):  # f32 HIGHEST like the mainline (x2 must not quantize:
        # grad1's x1·rowsum − W@x2 cancellation amplifies input error ~10x)
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        )

    lvl_last = _level2(jnp.asarray(float(n_levels - 1)))

    def sweep_last(t, _):
        d2 = d2c[pl.ds(t * _TILE, _TILE), :]
        phase3_tile(t, d2, kexp(lvl_last, d2), first=False)
        wt = wacc[pl.ds(t * _TILE, _TILE), :].astype(f32)  # bf16 store, f32 math
        xt = x1_ref[pl.ds(t * _TILE, _TILE), :]
        row5 = dot(wt, aug2, (((1,), (0,)), ((), ())))
        n1 = jnp.sum(xt * xt, axis=1, keepdims=True)
        contrib = (
            row5[:, 3:4] + n1 * row5[:, 4:5]
            - 2.0 * jnp.sum(xt * row5[:, 0:3], axis=1, keepdims=True)
        )
        cost_ref[...] = cost_ref[...] + jnp.sum(contrib)
        grad1_ref[pl.ds(t * _TILE, _TILE), :] = xt * row5[:, 4:5] - row5[:, 0:3]
        aug = jnp.concatenate([xt, jnp.ones((_TILE, 1), f32)], axis=1)
        g2_acc[...] += dot(wt, aug, (((0,), (0,)), ((), ())))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep_last, None)
    grad2_ref[...] = x2 * g2_acc[:, 3:4] - g2_acc[:, 0:3]


def _forward_bf16s(x1, x2, interpret=False):
    b, n, c = x1.shape
    m = x2.shape[1]
    mult_l, mult_r = (1.0, float(n // m)) if n >= m else (float(m // n), 1.0)
    kernel = functools.partial(_emd_kernel_bf16s, n=n, m=m, mult_l=mult_l, mult_r=mult_r)
    cost, grad1, grad2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, c, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((m, 4), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),  # d2 cache: precision-critical
            pltpu.VMEM((n, m), jnp.bfloat16),  # accumulated winv
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(x1, x2, jnp.swapaxes(x2, 1, 2))
    return cost[:, 0, 0], grad1, grad2


def _emd_kernel_pair2(
    x1_ref, x2_ref, x2t_ref, cost_ref, grad1_ref, grad2_ref,
    remain_l, ratio_l, remain_r, ratio_r, col_acc, g2_acc, d2c, wacc,
    *, n: int, m: int, mult_l: float, mult_r: float,
):
    """Two batch pairs per instance, sweeps interleaved tile-by-tile.

    Scratch arrays carry both pairs stacked on the row axis: row offset
    ``p * n`` (or ``p`` for the (2, m)-shaped column state)."""
    n_tiles = n // _TILE
    n_levels = len(APPROX_MATCH_LEVELS)
    aug2s = []
    for p in range(2):
        x2p = x2_ref[p]
        n2 = jnp.sum(x2p * x2p, axis=1, keepdims=True)
        aug2s.append(jnp.concatenate([x2p, n2, jnp.ones((m, 1), jnp.float32)], axis=1))

    remain_l[...] = jnp.full((2 * n, 1), mult_l, jnp.float32)
    remain_r[...] = jnp.full((2, m), mult_r, jnp.float32)
    cost_ref[...] = jnp.zeros((2, 1, 1), jnp.float32)
    g2_acc[...] = jnp.zeros((2 * m, 4), jnp.float32)
    col_acc[...] = jnp.zeros((2, m), jnp.float32)

    def phase12_tile(p, t, k):
        r = p * n + t * _TILE
        suml = jnp.sum(k * remain_r[p : p + 1, :], axis=1, keepdims=True)
        rl = remain_l[pl.ds(r, _TILE), :] / (suml + 1e-9)
        ratio_l[pl.ds(r, _TILE), :] = rl
        col_acc[p : p + 1, :] += jnp.sum(k * rl, axis=0, keepdims=True)

    def phase3_tile(p, t, d2, k, first):
        r = p * n + t * _TILE
        rl = ratio_l[pl.ds(r, _TILE), :]
        w = k * rl * ratio_r[p : p + 1, :]
        remain_l[pl.ds(r, _TILE), :] = jnp.maximum(
            0.0, remain_l[pl.ds(r, _TILE), :] - jnp.sum(w, axis=1, keepdims=True)
        )
        winv = w * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
        if first:
            wacc[pl.ds(r, _TILE), :] = winv
        else:
            wacc[pl.ds(r, _TILE), :] += winv

    def interphase():
        demand = col_acc[...] * remain_r[...]
        consumption = jnp.minimum(remain_r[...] / (demand + 1e-9), 1.0)
        ratio_r[...] = consumption * remain_r[...]
        remain_r[...] = jnp.maximum(0.0, remain_r[...] - demand)
        col_acc[...] = jnp.zeros((2, m), jnp.float32)

    def sweep0(t, _):
        for p in range(2):
            xt = x1_ref[p, pl.ds(t * _TILE, _TILE), :]
            d2 = jnp.zeros((_TILE, m), jnp.float32)
            for c in range(3):
                diff = xt[:, c : c + 1] - x2t_ref[p, c : c + 1, :]
                d2 = d2 + diff * diff
            d2c[pl.ds(p * n + t * _TILE, _TILE), :] = d2
            phase12_tile(p, t, jnp.exp2(_level2(jnp.asarray(0.0)) * d2))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep0, None)
    interphase()

    def sweepL(li, _):
        lvl = _level2(li.astype(jnp.float32))
        lvl_prev = _level2(li.astype(jnp.float32) - 1.0)

        def make_body(first):
            def body(t, _):
                for p in range(2):
                    d2 = d2c[pl.ds(p * n + t * _TILE, _TILE), :]
                    phase3_tile(p, t, d2, jnp.exp2(lvl_prev * d2), first=first)
                    phase12_tile(p, t, jnp.exp2(lvl * d2))
                return _

            return body

        jax.lax.cond(
            li == 1,
            lambda: jax.lax.fori_loop(0, n_tiles, make_body(True), None),
            lambda: jax.lax.fori_loop(0, n_tiles, make_body(False), None),
        )
        interphase()
        return _

    jax.lax.fori_loop(1, n_levels, sweepL, None)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )

    lvl_last = _level2(jnp.asarray(float(n_levels - 1)))

    def sweep_last(t, _):
        for p in range(2):
            d2 = d2c[pl.ds(p * n + t * _TILE, _TILE), :]
            phase3_tile(p, t, d2, jnp.exp2(lvl_last * d2), first=False)
            wt = wacc[pl.ds(p * n + t * _TILE, _TILE), :]
            xt = x1_ref[p, pl.ds(t * _TILE, _TILE), :]
            row5 = dot(wt, aug2s[p], (((1,), (0,)), ((), ())))
            n1 = jnp.sum(xt * xt, axis=1, keepdims=True)
            contrib = (
                row5[:, 3:4] + n1 * row5[:, 4:5]
                - 2.0 * jnp.sum(xt * row5[:, 0:3], axis=1, keepdims=True)
            )
            cost_ref[p, :, :] += jnp.sum(contrib)
            grad1_ref[p, pl.ds(t * _TILE, _TILE), :] = xt * row5[:, 4:5] - row5[:, 0:3]
            aug = jnp.concatenate([xt, jnp.ones((_TILE, 1), jnp.float32)], axis=1)
            g2_acc[pl.ds(p * m, m), :] += dot(wt, aug, (((0,), (0,)), ((), ())))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep_last, None)
    for p in range(2):
        grad2_ref[p, :, :] = (
            x2_ref[p] * g2_acc[pl.ds(p * m, m), 3:4] - g2_acc[pl.ds(p * m, m), 0:3]
        )


def _forward_pair2(x1, x2, interpret=False):
    b, n, c = x1.shape
    m = x2.shape[1]
    assert b % 2 == 0
    mult_l, mult_r = (1.0, float(n // m)) if n >= m else (float(m // n), 1.0)
    kernel = functools.partial(_emd_kernel_pair2, n=n, m=m, mult_l=mult_l, mult_r=mult_r)
    cost, grad1, grad2 = pl.pallas_call(
        kernel,
        grid=(b // 2,),
        in_specs=[
            pl.BlockSpec((2, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * n, 1), jnp.float32),
            pltpu.VMEM((2 * n, 1), jnp.float32),
            pltpu.VMEM((2, m), jnp.float32),
            pltpu.VMEM((2, m), jnp.float32),
            pltpu.VMEM((2, m), jnp.float32),
            pltpu.VMEM((2 * m, 4), jnp.float32),
            pltpu.VMEM((2 * n, m), jnp.float32),
            pltpu.VMEM((2 * n, m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(x1, x2, jnp.swapaxes(x2, 1, 2))
    return cost[:, 0, 0], grad1, grad2


def check():
    """Variants vs the (already golden-validated) mainline kernel, interpret
    mode.  The only numeric difference allowed is exp2-recompute rounding."""
    import pccf.kernels.pallas_emd as mainline_mod

    rng = np.random.default_rng(0)
    b, n, m = 2, 512, 512
    x1 = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) / 2)
    x2 = jnp.asarray(rng.standard_normal((b, m, 3)).astype(np.float32) / 2)
    import functools as ft

    orig = pl.pallas_call
    pl.pallas_call = ft.partial(orig, interpret=True)
    try:
        ref = mainline_mod._emd_forward_and_grads(x1, x2)
    finally:
        pl.pallas_call = orig
    for name, fn, tol in [
        ('nokc', _forward_nokc, 1e-5),
        ('pair2', _forward_pair2, 1e-5),
        # bf16 sweep chain: quantization error is the design trade-off
        ('bf16s', _forward_bf16s, 5e-2),
    ]:
        got = fn(x1, x2, interpret=True)
        for part, g, r in zip(('cost', 'grad1', 'grad2'), got, ref):
            g, r = np.asarray(g), np.asarray(r)
            rel = np.max(np.abs(g - r)) / (np.max(np.abs(r)) + 1e-12)
            print(f'{name} {part}: max rel {rel:.2e}')
            assert rel < tol, (name, part, rel)
    print('check ok')


def bench():
    from pccf.kernels.pallas_emd import _emd_forward_and_grads as mainline

    import bench as benchmod

    rng = np.random.default_rng(0)
    b, n = 8, 2048
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) / 2)
    y = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) / 2)

    for name, fn in [
        ('mainline', mainline),
        ('nokc', _forward_nokc),
        ('pair2', _forward_pair2),
        ('bf16s', _forward_bf16s),
    ]:
        def step(carry, fn=fn):
            cx, cy = carry
            cost, g1, g2 = fn(cx, cy)
            return cx + 1e-3 * g1, cy + 1e-3 * g2

        t0 = time.time()
        dt = benchmod._marginal_scan_time(step, (x, y))
        print(f'{name}: {dt * 1e3:.3f} ms/batch-{b}  ({b / dt:.0f} pairs/s)  [wall {time.time() - t0:.0f}s]', flush=True)


if __name__ == '__main__':
    {'check': check, 'bench': bench}[sys.argv[1]]()
