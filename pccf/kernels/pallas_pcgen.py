"""Fused Pallas TPU kernel for the PCGen component-stack eval path.

The PCGen decoder (reference src/module/decoders.py:53-106) runs
``n_components`` parallel residual conv stacks over the joined latent
``x = w ⊙ map(sampling)`` and mixes them with tempered-softmax attention.
At the flagship shapes (B=16, N=2048, w_dim=1024, conv_dims=(1024, 256, 16),
G=8) the stack is ~0.7 TFLOP per batch, but the XLA route materialises the
(G, B, N, 1024) first-layer activations in HBM (>1 GB round-trip between the
two grouped matmuls) and is bandwidth-bound.

This kernel keeps every per-component intermediate in VMEM: one grid step
processes a (TILE, w_dim) row tile, loops the components in-register
(weights are VMEM-resident across the whole grid — ~21 MB in bf16 on a v5e's
~128 MB VMEM), applies the folded-BN affine + activation + the reference's
interleaved residual, computes the per-component 3-d heads AND the attention
mixing, and writes only the final (TILE, 3) mixture.  The map MLP's Hardtanh
head and the ``w ⊙ map`` join are fused in as well (the layer-0 interleaved
residual comes from a column-interleaved copy of the map head — hardtanh and
the w-product commute with column duplication), so the only large HBM input
is the (B, N, map_dim) penultimate map activation: ~8 MB vs the >1 GB
round-trips of the XLA route.  Matmuls run single-pass bf16 with f32
accumulation (the same MXU precision XLA uses for these f32 matmuls by
default, so fused vs unfused outputs agree to bf16 rounding).

Eval only: training needs batch statistics and gradients and keeps the XLA
path (pccf/nn/decoders.py).

Sharding note: the pallas_call declares no sharding rules, so under a
(dp, mp) tensor-parallel mesh GSPMD replicates the weight operands
(~21 MB) on every device before the kernel runs — correct, but the TP
memory saving does not extend into this kernel.  The model fits a single
chip comfortably; TP serving at these shapes is a demo capability.

Semantics folded in (all cited to the reference):
- DenseBlock = dense (no bias) + BN running-stat affine + act
  (layers.py:150-170): BN folds to ``W' = W * a``, ``b' = β − μ·a``.
- Interleaved residual ``repeat_interleave(out//in + 1)[:, :out]``
  (layers.py:165-167): layer 0 may expand, so its residual is produced
  in-kernel from the interleaved map head (Mosaic cannot relayout an
  interleave across lanes); later layers satisfy out ≤ in and use an
  in-kernel prefix slice.
- Soft-init heads with bias (decoders.py:53-62), attention dense + softmax
  of logits/τ (decoders.py:92-106, layers.py:206).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 256
_VMEM_BUDGET = int(100e6)


def pcgen_fused_supported(n: int, w_dim: int, conv_dims: tuple[int, ...], n_components: int) -> bool:
    """True when the fused eval kernel covers these shapes.

    Requires: row tiles divide N, a lane-aligned input width, non-expanding
    layers after the first (their residual is a prefix slice), and all
    component weights resident in VMEM.
    """
    if n % _TILE or w_dim % 128 or n_components < 2:
        return False
    dims = (w_dim, *conv_dims)
    if any(dims[i + 1] >= dims[i] for i in range(1, len(dims) - 1)):
        return False
    weight_bytes = sum(n_components * dims[i] * dims[i + 1] * 2 for i in range(len(dims) - 1))
    work_bytes = _TILE * (2 * w_dim * 4 + sum(conv_dims) * 8)
    return weight_bytes + work_bytes < _VMEM_BUDGET // 2


def _leaky(x: Array, slope: float) -> Array:
    return jnp.where(x >= 0, x, slope * x)


def _kernel(
    m_ref,
    w_ref,
    wrep_ref,
    wmap_ref,
    bmap_ref,
    wmaprep_ref,
    bmaprep_ref,
    *refs,
    dims: tuple[int, ...],
    g_count: int,
    tau: float,
    act_slope: float,
):
    n_layers = len(dims) - 1
    ws = refs[:n_layers]
    bs = refs[n_layers : 2 * n_layers]
    wh_ref, bh_ref, watt_ref, batt_ref, out_ref = refs[2 * n_layers :]

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # map tail: Hardtanh head of the sampling MLP (decoders.py:44-52), fused
    # so the (B, N, D0) joined latent never round-trips HBM.
    mt = m_ref[...]  # (T, Dm) bf16
    t_map = jnp.clip(dot(mt, wmap_ref[...]) + bmap_ref[...], -1.0, 1.0)
    xb = (w_ref[...] * t_map).astype(jnp.bfloat16)  # join: w ⊙ map(sampling)
    # layer-0 interleaved residual, via the column-interleaved map head
    # (hardtanh and the w-product commute with column duplication)
    t_rep = jnp.clip(dot(mt, wmaprep_ref[...]) + bmaprep_ref[...], -1.0, 1.0)
    rep0 = wrep_ref[...] * t_rep  # (T, D1) f32
    feats = []
    comps = []
    for g in range(g_count):
        h = dot(xb, ws[0][g]) + bs[0][g : g + 1, :]
        h = _leaky(h, act_slope) + rep0
        for i in range(1, n_layers):
            nxt = dot(h.astype(jnp.bfloat16), ws[i][g]) + bs[i][g : g + 1, :]
            h = _leaky(nxt, act_slope) + h[:, : dims[i + 1]]
        feats.append(h)  # (T, D_last)
        comps.append(dot(h.astype(jnp.bfloat16), wh_ref[g]) + bh_ref[g : g + 1, :])  # (T, 3)
    att_in = jnp.concatenate(feats, axis=-1)  # (T, G * D_last)
    logits = dot(att_in.astype(jnp.bfloat16), watt_ref[...]) + batt_ref[...]  # batt (1, G)
    att = jax.nn.softmax(logits / tau, axis=-1)  # (T, G)
    out = sum(att[:, g : g + 1] * comps[g] for g in range(g_count))
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=('dims', 'tau', 'act_slope'))
def pcgen_mix_tpu(
    m: Array,
    w: Array,
    map_w: Array,
    map_b: Array,
    layer_ws: tuple[Array, ...],
    layer_bs: tuple[Array, ...],
    head_w: Array,
    head_b: Array,
    att_w: Array,
    att_b: Array,
    *,
    dims: tuple[int, ...],
    tau: float,
    act_slope: float,
) -> Array:
    """Fused PCGen: map Hardtanh tail + join + component stacks + heads +
    tempered-softmax mix, one VMEM-resident kernel.

    Args:
        m: (B, N, Dm) penultimate map-MLP activations, f32 (cast inside) —
            the only large HBM input (~Dm/D0 of the joined-latent size).
        w: (B, D0) latent code.
        map_w / map_b: (Dm, D0) / (D0,) Hardtanh map head (with bias).
        layer_ws: per layer (G, Din, Dout) — BN-folded, bf16.
        layer_bs: per layer (G, Dout) — BN-folded bias, f32.
        head_w / head_b: (G, D_last, 3) bf16 / (G, 3) f32.
        att_w / att_b: (G*D_last, G) bf16 / (1, G) f32.
        dims: static (D0, *conv_dims).
        tau: softmax temperature; act_slope: LeakyReLU negative slope
            (0.0 = ReLU).

    Returns:
        (B, N, 3) mixed components, f32.
    """
    b, n, dm = m.shape
    d0, d1 = dims[0], dims[1]
    g_count = head_w.shape[0]
    n_layers = len(dims) - 1
    kernel = functools.partial(
        _kernel, dims=dims, g_count=g_count, tau=tau, act_slope=act_slope
    )
    # column-interleaved map head: produces the layer-0 residual pre-join
    map_w_rep = interleave_residual(map_w, d1)
    map_b_rep = interleave_residual(map_b, d1)[None, :]
    w_rep = interleave_residual(w, d1)[:, None, :]  # (B, 1, D1)
    const = lambda *shape: (lambda i, t: tuple(0 for _ in shape))  # noqa: E731
    full = lambda a: pl.BlockSpec(a.shape, const(*a.shape), memory_space=pltpu.VMEM)  # noqa: E731
    flops = 2 * b * n * g_count * sum(dims[i] * dims[i + 1] for i in range(n_layers))
    return pl.pallas_call(
        kernel,
        grid=(b, n // _TILE),
        in_specs=[
            pl.BlockSpec((None, _TILE, dm), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d0), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            full(map_w),
            pl.BlockSpec((1, d0), const(1, d0), memory_space=pltpu.VMEM),
            full(map_w_rep),
            pl.BlockSpec((1, d1), const(1, d1), memory_space=pltpu.VMEM),
            *[full(a) for a in layer_ws],
            *[full(a) for a in layer_bs],
            full(head_w),
            full(head_b),
            full(att_w),
            full(att_b),
        ],
        out_specs=pl.BlockSpec((None, _TILE, 3), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(m.size * 2 + flops // (2 * n)), transcendentals=int(b * n * g_count)
        ),
    )(
        m.astype(jnp.bfloat16),
        w[:, None, :],
        w_rep,
        map_w.astype(jnp.bfloat16),
        map_b[None, :],
        map_w_rep.astype(jnp.bfloat16),
        map_b_rep,
        *layer_ws,
        *layer_bs,
        head_w,
        head_b,
        att_w,
        att_b,
    )


def fold_bn_affine(kernel: Array, scale: Array, bias: Array, mean: Array, var: Array, eps: float = 1e-5):
    """Fold a running-stat BatchNorm into the preceding dense kernel.

    ``bn(x @ W) = (x @ W) * a + (β − μ·a)`` with ``a = γ / sqrt(σ² + ε)``.
    Returns (W·a as bf16, folded bias as f32); stacked leading axes broadcast.
    """
    a = scale * jax.lax.rsqrt(var + eps)
    w = (kernel * a[..., None, :]).astype(jnp.bfloat16)
    return w, bias - mean * a


# exact interleave computed in XLA (Mosaic cannot relayout an interleave
# across lanes, so it enters the kernel through interleaved weights instead)
from pccf.kernels.ops import interleave_residual  # noqa: E402  (re-export)
