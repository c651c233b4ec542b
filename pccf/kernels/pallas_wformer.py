"""Fused Pallas TPU kernels for the inner-CVAE transformer stacks.

The W-autoencoder's three transformer networks (reference
src/module/w_encoders.py:74-106, w_decoders.py:65-101,
w_conditional.py:58-91) run at 256 code tokens x 512 dims — far too small to
saturate the MXU as individual XLA ops, and the counterfactual serving path
(w_autoencoders.py:247-262) runs eight such layers per sample.  These
kernels execute an ENTIRE pre-norm stack in one ``pallas_call``:

- the token tile ``(T, d)`` and every layer's weights stay VMEM-resident —
  the residual stream never round-trips HBM between layers;
- layers and heads run in ``lax.fori_loop`` with dynamically-indexed weight
  stacks, so the Mosaic program is one layer long regardless of depth;
- matmuls feed the MXU in bf16 with f32 accumulation (same as XLA's default
  TPU precision); layernorm statistics, softmax, and the residual stream
  are f32;
- differing per-layer FF widths are zero-padded to the widest: GELU(0) = 0
  and zeroed rows of the second FF weight keep padded columns inert.

Eval path only (no dropout); the XLA route remains the training path.
Numerics match :class:`pccf.nn.layers.TransformerEncoderLayer` /
``TransformerDecoderLayer`` (pre-norm, torch ``norm_first=True`` semantics)
to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_BUDGET = int(100e6)
_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def wformer_supported(t: int, d: int, d_ff_max: int, n_layers: int, n_heads: int) -> bool:
    """True when the stack fits the kernel's tiling and VMEM budget."""
    if t % 128 or d % 128 or d % n_heads:
        return False
    # bf16 weights, decoder worst case: self-attention (4 d^2) + cross
    # attention (4 d^2) + FFN (2 d d_ff) per layer.
    weights = n_layers * (8 * d * d + 2 * d * d_ff_max) * 2
    work = t * d * 4 * 6 + t * t * 4 + t * d_ff_max * 4
    return weights + work <= _VMEM_BUDGET


def _layer_norm(x: Array, scale: Array, bias: Array) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _erf(x: Array) -> Array:
    """erf from mul/add/exp only: Mosaic's TC kernel type has no ``erf``
    lowering (NotImplementedError on real TPU; interpret mode hid this).
    Abramowitz & Stegun 7.1.26 rational approximation (exact-arithmetic bound
    |abs err| <= 1.5e-7; measured in f32 vs ``jax.lax.erf``: ~2.8e-6 max abs
    err) — either way far below the bf16 rounding of the surrounding
    matmuls."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    e = 1.0 - poly * jnp.exp(-z * z)
    return jnp.sign(x) * e


def _gelu_exact(x: Array) -> Array:
    # erf form (torch.nn.GELU default; pccf maps 'GELU' to approximate=False)
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _dot(a: Array, b: Array) -> Array:
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b,
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row(ref, i):
    """Dynamically-indexed leading-dim read, squeezed: ``ref[i]``."""
    v = ref[pl.ds(i, 1)]
    return v.reshape(v.shape[1:])


def _attention(h_bf, kv_bf, i, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, y_ref, *, head_dim):
    """One attention head's contribution, accumulated into ``y_ref``.

    ``h_bf``: (T, d) bf16 normed queries source; ``kv_bf``: (T_kv, d) bf16
    key/value source (== h_bf for self-attention).
    """
    q = _dot(h_bf, _row(wq_ref, i)) + _row(bq_ref, i)  # (T, hd) f32
    k = _dot(kv_bf, _row(wk_ref, i)) + _row(bk_ref, i)  # (Tkv, hd)
    v = _dot(kv_bf, _row(wv_ref, i)) + _row(bv_ref, i)
    scale = 1.0 / (head_dim ** 0.5)
    s = jax.lax.dot_general(
        (q * scale).astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, Tkv)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    av = _dot(p, v.astype(jnp.bfloat16))  # (T, hd)
    y_ref[...] += _dot(av, _row(wo_ref, i))  # (T, d)


def _enc_layers(
    out_ref,  # (T, d) f32: residual stream, pre-initialised by the caller
    h_scr,  # (T, d) bf16 scratch: normed input shared by the head loop
    y_scr,  # (T, d) f32 scratch: attention accumulator
    ln1_ref,  # (L, 2, d) f32: [scale, bias]
    wq_ref, wk_ref, wv_ref,  # (L*H, d, hd) bf16
    bq_ref, bk_ref, bv_ref,  # (L*H, 1, hd) f32
    wo_ref,  # (L*H, hd, d) bf16
    bo_ref,  # (L, 1, d) f32
    ln2_ref,  # (L, 2, d) f32
    w1_ref,  # (L, d, f_max) bf16
    b1_ref,  # (L, 1, f_max) f32
    w2_ref,  # (L, f_max, d) bf16
    b2_ref,  # (L, 1, d) f32
    *,
    n_layers: int,
    n_heads: int,
    head_dim: int,
):
    """Run ``n_layers`` pre-norm encoder layers over ``out_ref`` in place."""

    def layer(l, _):
        x = out_ref[...]
        ln1 = _row(ln1_ref, l)
        h_scr[...] = _layer_norm(x, ln1[0:1], ln1[1:2]).astype(jnp.bfloat16)
        y_scr[...] = jnp.zeros_like(y_scr)

        def head(hi, __):
            h_bf = h_scr[...]
            _attention(
                h_bf, h_bf, l * n_heads + hi,
                wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, y_scr,
                head_dim=head_dim,
            )
            return __

        jax.lax.fori_loop(0, n_heads, head, None)
        x = x + y_scr[...] + _row(bo_ref, l)

        ln2 = _row(ln2_ref, l)
        h2 = _layer_norm(x, ln2[0:1], ln2[1:2])
        f = _gelu_exact(_dot(h2, _row(w1_ref, l)) + _row(b1_ref, l))
        x = x + _dot(f, _row(w2_ref, l)) + _row(b2_ref, l)
        out_ref[...] = x
        return _

    jax.lax.fori_loop(0, n_layers, layer, None)


def _encoder_kernel(x_ref, *refs, n_layers: int, n_heads: int, head_dim: int):
    *stack, out_ref, h_scr, y_scr = refs
    out_ref[...] = x_ref[...]
    _enc_layers(out_ref, h_scr, y_scr, *stack, n_layers=n_layers, n_heads=n_heads, head_dim=head_dim)


def _dec_layers(
    out_ref,  # (T, d) f32 residual stream, pre-initialised
    m_scr,  # (T_mem, d) bf16: memory tokens, pre-set by the caller
    h_scr,
    y_scr,
    ln1_ref,
    wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, bo_ref,  # self
    lnx_ref,  # (L, 2, d): cross-attention pre-norm
    xwq_ref, xwk_ref, xwv_ref, xbq_ref, xbk_ref, xbv_ref, xwo_ref, xbo_ref,  # cross
    ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    *,
    n_layers: int,
    n_heads: int,
    head_dim: int,
):
    """Run ``n_layers`` pre-norm decoder (self+cross) layers in place."""

    def layer(l, _):
        x = out_ref[...]
        ln1 = _row(ln1_ref, l)
        h_scr[...] = _layer_norm(x, ln1[0:1], ln1[1:2]).astype(jnp.bfloat16)
        y_scr[...] = jnp.zeros_like(y_scr)

        def self_head(hi, __):
            h_bf = h_scr[...]
            _attention(
                h_bf, h_bf, l * n_heads + hi,
                wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, y_scr,
                head_dim=head_dim,
            )
            return __

        jax.lax.fori_loop(0, n_heads, self_head, None)
        x = x + y_scr[...] + _row(bo_ref, l)

        lnx = _row(lnx_ref, l)
        h_scr[...] = _layer_norm(x, lnx[0:1], lnx[1:2]).astype(jnp.bfloat16)
        y_scr[...] = jnp.zeros_like(y_scr)

        def cross_head(hi, __):
            _attention(
                h_scr[...], m_scr[...], l * n_heads + hi,
                xwq_ref, xwk_ref, xwv_ref, xbq_ref, xbk_ref, xbv_ref, xwo_ref, y_scr,
                head_dim=head_dim,
            )
            return __

        jax.lax.fori_loop(0, n_heads, cross_head, None)
        x = x + y_scr[...] + _row(xbo_ref, l)

        ln2 = _row(ln2_ref, l)
        h2 = _layer_norm(x, ln2[0:1], ln2[1:2])
        f = _gelu_exact(_dot(h2, _row(w1_ref, l)) + _row(b1_ref, l))
        x = x + _dot(f, _row(w2_ref, l)) + _row(b2_ref, l)
        out_ref[...] = x
        return _

    jax.lax.fori_loop(0, n_layers, layer, None)


def _decoder_kernel(x_ref, mem_ref, *refs, n_layers: int, n_heads: int, head_dim: int):
    *stack, out_ref, h_scr, m_scr, y_scr = refs
    out_ref[...] = x_ref[...]
    m_scr[...] = mem_ref[...].astype(jnp.bfloat16)
    _dec_layers(
        out_ref, m_scr, h_scr, y_scr, *stack, n_layers=n_layers, n_heads=n_heads, head_dim=head_dim
    )


# --------------------------------------------------------- weight packing


def _pack_attention(layers: list[dict]) -> tuple:
    """Stack flax MHA param trees into the kernel's dynamic-index layout."""

    def stk(path, transpose=None, flatten=None):
        arrs = [functools.reduce(lambda t, k: t[k], path, lp) for lp in layers]
        out = jnp.stack(arrs)
        if transpose:
            out = jnp.transpose(out, transpose)
        if flatten:
            out = out.reshape(flatten(out.shape))
        return out

    # kernel (d, h, hd) -> (L, h, d, hd) -> (L*H, d, hd)
    def qkv(name):
        w = stk([name, 'kernel'], transpose=(0, 2, 1, 3), flatten=lambda s: (s[0] * s[1], s[2], s[3]))
        b = stk([name, 'bias'], flatten=lambda s: (s[0] * s[1], 1, s[2]))
        return w.astype(jnp.bfloat16), b.astype(jnp.float32)

    wq, bq = qkv('query')
    wk, bk = qkv('key')
    wv, bv = qkv('value')
    # out kernel (h, hd, d) -> (L*H, hd, d); bias (d,) -> (L, 1, d)
    wo = stk(['out', 'kernel'], flatten=lambda s: (s[0] * s[1], s[2], s[3])).astype(jnp.bfloat16)
    bo = stk(['out', 'bias'])[:, None, :].astype(jnp.float32)
    return wq, wk, wv, bq, bk, bv, wo, bo


def _pack_ln(layers: list[dict]) -> Array:
    return jnp.stack(
        [jnp.stack([lp['scale'], lp['bias']]) for lp in layers]
    ).astype(jnp.float32)  # (L, 2, d)


def _pack_ff(layers1: list[dict], layers2: list[dict], f_max: int) -> tuple:
    def padded(kernel, bias, rows_to):
        k = jnp.asarray(kernel)
        b = jnp.asarray(bias)
        if rows_to == 'cols':  # pad output columns (d -> f_max)
            k = jnp.pad(k, ((0, 0), (0, f_max - k.shape[1])))
            b = jnp.pad(b, (0, f_max - b.shape[0]))
        else:  # pad input rows (f -> f_max)
            k = jnp.pad(k, ((0, f_max - k.shape[0]), (0, 0)))
        return k, b

    w1s, b1s, w2s, b2s = [], [], [], []
    for l1, l2 in zip(layers1, layers2, strict=True):
        k1, b1 = padded(l1['kernel'], l1['bias'], 'cols')
        k2, _ = padded(l2['kernel'], l2['bias'], 'rows')
        w1s.append(k1)
        b1s.append(b1)
        w2s.append(k2)
        b2s.append(jnp.asarray(l2['bias']))
    return (
        jnp.stack(w1s).astype(jnp.bfloat16),
        jnp.stack(b1s)[:, None, :].astype(jnp.float32),
        jnp.stack(w2s).astype(jnp.bfloat16),
        jnp.stack(b2s)[:, None, :].astype(jnp.float32),
    )


def pack_encoder_params(layer_params: list[dict], f_max: int) -> tuple:
    """Flax ``TransformerEncoderLayer`` params (one dict per layer) -> kernel
    operand tuple.  ``f_max`` pads differing FF widths (GELU(0)=0 keeps
    padded columns inert)."""
    ln1 = _pack_ln([lp['LayerNorm_0'] for lp in layer_params])
    attn = _pack_attention([lp['MultiHeadDotProductAttention_0'] for lp in layer_params])
    ln2 = _pack_ln([lp['LayerNorm_1'] for lp in layer_params])
    ff = _pack_ff(
        [lp['Dense_0'] for lp in layer_params], [lp['Dense_1'] for lp in layer_params], f_max
    )
    return (ln1, *attn, ln2, *ff)


def pack_decoder_params(layer_params: list[dict], f_max: int) -> tuple:
    """Flax ``TransformerDecoderLayer`` params -> kernel operand tuple."""
    ln1 = _pack_ln([lp['LayerNorm_0'] for lp in layer_params])
    self_attn = _pack_attention([lp['MultiHeadDotProductAttention_0'] for lp in layer_params])
    lnx = _pack_ln([lp['LayerNorm_1'] for lp in layer_params])
    cross_attn = _pack_attention([lp['MultiHeadDotProductAttention_1'] for lp in layer_params])
    ln2 = _pack_ln([lp['LayerNorm_2'] for lp in layer_params])
    ff = _pack_ff(
        [lp['Dense_0'] for lp in layer_params], [lp['Dense_1'] for lp in layer_params], f_max
    )
    return (ln1, *self_attn, lnx, *cross_attn, ln2, *ff)


def _const_spec(arr: Array) -> pl.BlockSpec:
    n = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i, *, _n=n: (0,) * _n, memory_space=pltpu.VMEM)


def wformer_encoder_tpu(x: Array, packed: tuple, *, n_heads: int) -> Array:
    """Run a full pre-norm encoder stack: ``(B, T, d) -> (B, T, d)``."""
    b, t, d = x.shape
    n_layers = packed[0].shape[0]
    head_dim = d // n_heads
    kernel = functools.partial(
        _encoder_kernel, n_layers=n_layers, n_heads=n_heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[_const_spec(p) for p in packed],
        ],
        out_specs=pl.BlockSpec((None, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.bfloat16),
            pltpu.VMEM((t, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(b * n_layers * (8 * t * d * d + 4 * t * t * d)),
            bytes_accessed=int(b * t * d * 4 * 2 + sum(p.size * p.dtype.itemsize for p in packed)),
            transcendentals=int(b * n_layers * t * (t + d)),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(x.astype(jnp.float32), *packed)


def wformer_decoder_tpu(x: Array, memory: Array, packed: tuple, *, n_heads: int) -> Array:
    """Run a full pre-norm decoder stack with cross-attention memory."""
    b, t, d = x.shape
    t_mem = memory.shape[1]
    n_layers = packed[0].shape[0]
    head_dim = d // n_heads
    kernel = functools.partial(
        _decoder_kernel, n_layers=n_layers, n_heads=n_heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_mem, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[_const_spec(p) for p in packed],
        ],
        out_specs=pl.BlockSpec((None, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.bfloat16),
            pltpu.VMEM((t_mem, d), jnp.bfloat16),
            pltpu.VMEM((t, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(b * n_layers * (14 * t * d * d + 8 * t * t * d)),
            bytes_accessed=int(b * t * d * 4 * 3 + sum(p.size * p.dtype.itemsize for p in packed)),
            transcendentals=int(b * n_layers * t * (2 * t + d)),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(x.astype(jnp.float32), memory.astype(jnp.float32), *packed)
