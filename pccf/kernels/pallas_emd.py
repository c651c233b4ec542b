"""Fused Pallas TPU kernel for ApproxMatch EMD (forward + analytic grads).

TPU-native redesign of the reference CUDA pipeline
(external/pytorch_structural_losses/src/approxmatch.cu: ``approxmatchkernel``,
``matchcostkernel``, ``matchcostgrad{1,2}kernel``).  The 9-level relaxation
contract (level = -4^j, j=7..-1, approxmatch.cu:24-27) is preserved exactly;
the schedule is rebuilt around the v5e memory hierarchy:

- **VMEM-resident quadratic state.**  v5e has ~128 MB of VMEM (the 16 MB
  figure is only the compiler's default scoped limit), so the ``(N, M)``
  squared-distance matrix is computed ONCE and cached in VMEM (f32), as is
  the per-level kernel matrix — the CUDA version recomputes both three times
  per level.
- **Fused sweeps.**  phase 3 of level L-1 only needs per-tile state that
  phase 1+2 of level L also touches, so one pass over the distance matrix
  serves both: 10 total sweeps (and 9 exp sweeps) instead of 27.
- **One gradient matmul pass.**  Cost and both gradients are *linear* in the
  rsqrt-weighted assignment ``winv``, so the kernel accumulates
  ``W = sum_levels winv`` in VMEM and runs the narrow (x2 | |x2|^2 | 1)
  matmuls once at the end — profiling showed the per-level matmul feeds
  (operand hi/lo splits + 8-wide MXU passes) were ~60% of kernel time.
- **Cost via the expansion identity.**  ``sum W*d2 = |x1|^2 sum(W) +
  sum(W |x2|^2) - 2 x1 . (W @ x2)`` rides the same matmul, so the forward
  cost needs no extra (N, M) sweep (``w*sqrt(d2) == winv*d2``).
- Forward and backward are produced in a single kernel launch; the
  ``custom_vjp`` backward just scales the saved gradients, matching the
  reference autograd contract (match treated as constant,
  structural_losses/match_cost.py:31-42).

Measured vs the f64 oracle this is *more* accurate than the previous
per-level bf16x3 schedule (grad max-rel 1.9e-4 vs 4.8e-4) and 3.4x faster
(1.49 ms vs 5.0 ms per batch-8 fwd+bwd at 2048 pts on one v5e chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pccf.kernels import _chamfer_fold
from pccf.kernels.ops import APPROX_MATCH_LEVELS

Array = jax.Array

_LOG2E = 1.4426950408889634
_TILE = 512  # x1 rows per inner step
# three f32 (N, M) VMEM caches (d2, k, W) + blocks must fit in ~100 MB
_VMEM_BUDGET = int(100e6)


def _vmem_bytes(n: int, m: int) -> int:
    return 3 * n * m * 4 + 8 * max(n, m) * 512  # caches + padded blocks/scratch


def emd_fits_vmem(n: int, m: int) -> bool:
    """True when the fused kernel's VMEM-resident caches fit on a v5e core."""
    return _vmem_bytes(n, m) <= _VMEM_BUDGET


def _emd_kernel(
    x1_ref,  # (N, 3) VMEM in
    x2_ref,  # (M, 3) VMEM in
    x2t_ref,  # (3, M) VMEM in (transposed copy for the distance expansion)
    cost_ref,  # (1, 1) VMEM out
    grad1_ref,  # (N, 3) VMEM out
    grad2_ref,  # (M, 3) VMEM out
    *rest,  # [chamfer outs: d1 (N,1) f32, i1 (N,1) i32, dc2 (1,M) f32,
    #          ic2 (1,M) i32 when with_chamfer] + 9 scratch refs:
    # remain_l (N, 1), ratio_l (N, 1), remain_r (1, M), ratio_r (1, M),
    # col_acc (1, M) phase-2 column demand, g2_acc (M, 4) [W^T@x1 | colsum],
    # d2c (N, M) cached squared distances, kc (N, M) current level kernel,
    # wacc (N, M) accumulated winv over levels
    n: int,
    m: int,
    mult_l: float,
    mult_r: float,
    with_chamfer: bool = False,
):
    if with_chamfer:
        d1_ref, i1_ref, dc2_ref, ic2_ref = rest[:4]
        rest = rest[4:]
    remain_l, ratio_l, remain_r, ratio_r, col_acc, g2_acc, d2c, kc, wacc = rest
    x2 = x2_ref[...]
    n_tiles = n // _TILE
    n_levels = len(APPROX_MATCH_LEVELS)
    # 5-column augmented x2 for the fused cost+grad matmul
    n2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
    aug2 = jnp.concatenate([x2, n2, jnp.ones((m, 1), jnp.float32)], axis=1)

    remain_l[...] = jnp.full((n, 1), mult_l, jnp.float32)
    remain_r[...] = jnp.full((1, m), mult_r, jnp.float32)
    cost_ref[...] = jnp.zeros((1, 1), jnp.float32)
    g2_acc[...] = jnp.zeros((m, 4), jnp.float32)
    col_acc[...] = jnp.zeros((1, m), jnp.float32)
    if with_chamfer:
        _chamfer_fold.fold_init(dc2_ref, ic2_ref, m)

    def level2_of(li):
        # level = -4^(7-li), folded with log2(e) for the hardware exp2
        return -jnp.exp2(14.0 - 2.0 * li.astype(jnp.float32)) * _LOG2E

    def phase12_tile(t, k):
        """Store this level's kernel tile; accumulate row ratios + col demand."""
        kc[pl.ds(t * _TILE, _TILE), :] = k
        suml = jnp.sum(k * remain_r[...], axis=1, keepdims=True)
        rl = remain_l[pl.ds(t * _TILE, _TILE), :] / (suml + 1e-9)
        ratio_l[pl.ds(t * _TILE, _TILE), :] = rl
        col_acc[...] += jnp.sum(k * rl, axis=0, keepdims=True)

    def phase3_tile(t, d2, k, first):
        """Assign mass for the previous level; accumulate winv into W."""
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

    # sweep 0: compute + cache d2 (exact f32 elementwise expansion — avoids
    # tiny negative d2 and the Mosaic HIGHEST matmul emulation), phase12 of
    # the sharpest level
    def sweep0(t, _):
        xt = x1_ref[pl.ds(t * _TILE, _TILE), :]
        d2 = jnp.zeros((_TILE, m), jnp.float32)
        for c in range(3):
            diff = xt[:, c : c + 1] - x2t_ref[c : c + 1, :]
            d2 = d2 + diff * diff
        d2c[pl.ds(t * _TILE, _TILE), :] = d2
        if with_chamfer:
            # Chamfer rides the one-time d2 sweep for ~5 extra ops/element
            # (vs the 9-level relaxation's ~100): row/col min+argmin exactly
            # as the standalone chamfer kernel (shared fold helper)
            _chamfer_fold.fold_tile(d2, t * _TILE, d1_ref, i1_ref, dc2_ref, ic2_ref)
        phase12_tile(t, jnp.exp2(level2_of(jnp.asarray(0.0)) * d2))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep0, None)
    interphase()

    # sweeps 1..8: phase3(L-1) fused with phase12(L) in one pass over d2
    def sweepL(li, _):
        level2 = level2_of(li.astype(jnp.float32))

        def body(t, _):
            d2 = d2c[pl.ds(t * _TILE, _TILE), :]
            phase3_tile(t, d2, kc[pl.ds(t * _TILE, _TILE), :], first=False)
            phase12_tile(t, jnp.exp2(level2 * d2))
            return _

        def body_first(t, _):
            d2 = d2c[pl.ds(t * _TILE, _TILE), :]
            phase3_tile(t, d2, kc[pl.ds(t * _TILE, _TILE), :], first=True)
            phase12_tile(t, jnp.exp2(level2 * d2))
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
            a,
            b,
            dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    # final sweep: last phase3 + the one-and-only cost/gradient matmul pass
    def sweep_last(t, _):
        d2 = d2c[pl.ds(t * _TILE, _TILE), :]
        phase3_tile(t, d2, kc[pl.ds(t * _TILE, _TILE), :], first=False)
        wt = wacc[pl.ds(t * _TILE, _TILE), :]
        xt = x1_ref[pl.ds(t * _TILE, _TILE), :]
        # row side: W @ [x2 | |x2|^2 | 1] -> (T, 5)
        row5 = dot(wt, aug2, (((1,), (0,)), ((), ())))
        # cost via sum W*d2 = |x1|^2 sum(W) + sum(W |x2|^2) - 2 x1 . (W @ x2)
        n1 = jnp.sum(xt * xt, axis=1, keepdims=True)
        contrib = (
            row5[:, 3:4]
            + n1 * row5[:, 4:5]
            - 2.0 * jnp.sum(xt * row5[:, 0:3], axis=1, keepdims=True)
        )
        cost_ref[...] = cost_ref[...] + jnp.sum(contrib)
        grad1_ref[pl.ds(t * _TILE, _TILE), :] = xt * row5[:, 4:5] - row5[:, 0:3]
        # column side: W^T @ [x1 | 1] -> (M, 4)
        aug = jnp.concatenate([xt, jnp.ones((_TILE, 1), jnp.float32)], axis=1)
        g2_acc[...] += dot(wt, aug, (((0,), (0,)), ((), ())))
        return _

    jax.lax.fori_loop(0, n_tiles, sweep_last, None)

    # grad2_l = x2_l * colsum_l - sum_k W_kl x1_k
    grad2_ref[...] = x2 * g2_acc[:, 3:4] - g2_acc[:, 0:3]


def _call_emd_kernel(x1: Array, x2: Array, with_chamfer: bool) -> tuple[Array, ...]:
    b, n, c = x1.shape
    m = x2.shape[1]
    if n % _TILE:
        raise ValueError(f'n must be a multiple of {_TILE}, got {n}')
    from pccf.kernels.ops import emd_marginal_multipliers

    mult_l, mult_r = emd_marginal_multipliers(n, m)

    kernel = functools.partial(
        _emd_kernel, n=n, m=m, mult_l=mult_l, mult_r=mult_r, with_chamfer=with_chamfer
    )
    out_specs = [
        pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        jax.ShapeDtypeStruct((b, m, c), jnp.float32),
    ]
    if with_chamfer:
        cham_specs, cham_shapes = _chamfer_fold.fold_out_specs(b, n, m)
        out_specs += cham_specs
        out_shape += cham_shapes
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, c, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((m, 4), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(10 * b * n * m * 12) + (int(5 * b * n * m) if with_chamfer else 0),
            bytes_accessed=int(b * (n + m) * c * 4 * 4),
            transcendentals=int(9 * b * n * m),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(x1, x2, jnp.swapaxes(x2, 1, 2))


def _emd_forward_and_grads(x1: Array, x2: Array) -> tuple[Array, Array, Array]:
    """cost (B,), grad1 (B,N,3), grad2 (B,M,3) in one fused launch."""
    cost, grad1, grad2 = _call_emd_kernel(x1, x2, with_chamfer=False)
    return cost[:, 0, 0], grad1, grad2


def _emd_chamfer_forward(x1: Array, x2: Array):
    """One launch: EMD cost+grads AND bidirectional NN min/argmin.

    Returns ``cost (B,), grad1 (B,N,3), grad2 (B,M,3), d1 (B,N), i1 (B,N),
    d2 (B,M), i2 (B,M)`` — the chamfer outputs match
    :func:`pccf.kernels.ops.nn_distance` and ride the d2 sweep the EMD
    relaxation computes anyway (the standalone chamfer kernel re-derives the
    same (N, M) distance structure; fused, it costs ~5 extra VPU
    ops/element on the one-time sweep)."""
    cost, grad1, grad2, d1, i1, dc2, ic2 = _call_emd_kernel(x1, x2, with_chamfer=True)
    return (
        cost[:, 0, 0],
        grad1,
        grad2,
        d1[:, :, 0],
        i1[:, :, 0],
        dc2[:, 0, :],
        ic2[:, 0, :],
    )


@jax.custom_vjp
def match_cost_tpu(x1: Array, x2: Array) -> Array:
    """Approximate EMD on TPU via the fused Pallas kernel: ``(B,)``.

    Numerically matches :func:`pccf.kernels.ops.match_cost`.
    """
    cost, _, _ = _emd_forward_and_grads(x1, x2)
    return cost


def _mc_fwd(x1, x2):
    cost, grad1, grad2 = _emd_forward_and_grads(x1, x2)
    return cost, (grad1, grad2)


def _mc_bwd(res, g):
    grad1, grad2 = res
    g = g[:, None, None]
    return grad1 * g, grad2 * g


match_cost_tpu.defvjp(_mc_fwd, _mc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chamfer_match_cost_tpu(
    x1: Array, x2: Array, reduction: str = 'mean'
) -> tuple[Array, Array]:
    """Chamfer AND ApproxMatch EMD ``((B,), (B,))`` from ONE kernel launch.

    The ChamferEMD composite loss (reference metrics_and_losses.py:70-79)
    evaluates both metrics on the same cloud pair; run separately, the two
    kernels each build the full (N, M) distance structure.  Fused, chamfer's
    min/argmin ride the EMD kernel's one-time d2 sweep — saving the entire
    standalone chamfer launch (~0.7 of the ~2.5 ms combined batch-8 time).

    Numerically matches ``(ops.chamfer, ops.match_cost)``; the backward
    combines the chamfer analytic gradients (indices constant, Danskin) with
    the EMD match-constant gradients (structural_losses/match_cost.py:31-42).
    """
    cost, _, _, d1, _, d2, _ = _emd_chamfer_forward(x1, x2)
    red = jnp.mean if reduction == 'mean' else jnp.sum
    return red(d1, axis=1) + red(d2, axis=1), cost


def _cmc_fwd(x1, x2, reduction):
    cost, grad1, grad2, d1, i1, d2, i2 = _emd_chamfer_forward(x1, x2)
    red = jnp.mean if reduction == 'mean' else jnp.sum
    cham = red(d1, axis=1) + red(d2, axis=1)
    return (cham, cost), (x1, x2, i1, i2, grad1, grad2)


def _cmc_bwd(reduction, res, g):
    x1, x2, i1, i2, egrad1, egrad2 = res
    g_cham, g_emd = g
    # EMD side: match held constant, saved grads scaled by the cotangent
    ge = g_emd[:, None, None]
    gx = egrad1 * ge
    gy = egrad2 * ge
    # chamfer side: same analytic form as pallas_chamfer._chamfer_bwd
    n, m = x1.shape[1], x2.shape[1]
    scale1 = 1.0 / n if reduction == 'mean' else 1.0
    scale2 = 1.0 / m if reduction == 'mean' else 1.0
    gc = g_cham[:, None, None]
    ny = jnp.take_along_axis(x2, i1[..., None], axis=1)  # (B, N, C)
    nx = jnp.take_along_axis(x1, i2[..., None], axis=1)  # (B, M, C)
    gx1 = 2.0 * scale1 * (x1 - ny) * gc
    gy2 = 2.0 * scale2 * (x2 - nx) * gc
    gy1 = jnp.zeros_like(x2).at[jnp.arange(x2.shape[0])[:, None], i1].add(-gx1)
    gx2 = jnp.zeros_like(x1).at[jnp.arange(x1.shape[0])[:, None], i2].add(-gy2)
    return gx + gx1 + gx2, gy + gy1 + gy2


chamfer_match_cost_tpu.defvjp(_cmc_fwd, _cmc_bwd)
