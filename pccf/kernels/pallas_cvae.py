"""Single-launch Pallas kernel for the whole inner-CVAE counterfactual path.

The deterministic counterfactual decode (reference
src/module/w_autoencoders.py:247-262: encode_z1 -> interpolate probs ->
encode_z2 -> z1 = mu1, z2 = p_mu2 + d_mu2 -> decode) chains three 256-token
transformer stacks plus seven head matmuls.  Each stack already had a fused
kernel (:mod:`pccf.kernels.pallas_wformer`), but the path still paid three
launches plus ~30 boundary XLA ops on (B, 256, 512) intermediates — at these
shapes the compute is ~0.6 ms while the measured path cost ~4.1 ms
(BASELINE.md round-2 profile), i.e. launch/boundary-overhead-bound.

This kernel runs the ENTIRE path in ONE ``pallas_call`` per batch:

- every head matmul folds into its neighbour at pack time (affine chains
  compose): ``memory = h1 @ (W_lat1[:, :z1] @ W_z1) + fold(b, pos)``,
  ``x_dec = h2 @ (W_lat2[:, :z2] @ W_z2) + probs-terms + fold(b, pos)``,
  so the kernel body is three stacks joined by one (d, d) matmul each;
- the probability-conditioned terms (``prob_proj`` row, the conditional
  prior's contribution ``p_mu2 @ W_z2``) are tiny matmuls from ``probs``
  computed OUTSIDE in XLA (2 fused ops) and passed as per-batch operands —
  the prior's weight folds with ``z2_proj`` at pack time into a single
  ``(n_classes, T, d)`` tensor;
- all three weight stacks stay VMEM-resident (~42 MB at the flagship
  2+2+4-layer / d=512 / f=1024 config, under the 100 MB budget).

Eval path only; the XLA route remains for training and for configs the gate
rejects (VampPrior pseudo-inputs, non-transformer nets, differing
proj_dims).  Numerics: bf16 MXU matmuls with f32 accumulation and an f32
residual stream, identical to the per-stack fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pccf.kernels.pallas_wformer import (
    _dec_layers,
    _dot,
    _enc_layers,
    pack_decoder_params,
    pack_encoder_params,
)

Array = jax.Array

_VMEM_BUDGET = int(100e6)
_IN_PAD = 128  # token embedding dim padded to one lane tile

_N_ENC_OPERANDS = 14  # ln1, 8 attn, ln2, 4 ff (pack_encoder_params layout)
_N_DEC_OPERANDS = 23  # ln1, 8 self, lnx, 8 cross, ln2, 4 ff


def cvae_cf_supported(
    t: int,
    d: int,
    f_max: int,
    n_layers_total: int,
    heads: tuple[int, ...],
    embedding_dim: int,
) -> bool:
    """True when the counterfactual CVAE chain fits this kernel's layout."""
    if t % 128 or d % 128 or embedding_dim > _IN_PAD:
        return False
    if any(d % h for h in heads):
        return False
    weights = n_layers_total * (8 * d * d + 2 * d * f_max) * 2  # bf16, decoder-worst
    heads_bytes = (2 * _IN_PAD * d + 2 * d * d + d * _IN_PAD) * 2 + 6 * t * d * 4
    work = t * d * 4 * 8 + t * t * 4 + t * f_max * 4
    return weights + heads_bytes + work <= _VMEM_BUDGET


def _cvae_kernel(*refs, l1: int, l2: int, ld: int, h1: int, h2: int, hd: int, d: int):
    (x_ref, pemb_ref, pz2p_ref), rest = refs[:3], refs[3:]
    win1_ref, add1_ref = rest[0], rest[1]
    e1 = rest[2 : 2 + _N_ENC_OPERANDS]
    o = 2 + _N_ENC_OPERANDS
    aw_ref, ab_ref = rest[o], rest[o + 1]
    win2_ref, add2_ref = rest[o + 2], rest[o + 3]
    e2 = rest[o + 4 : o + 4 + _N_ENC_OPERANDS]
    o = o + 4 + _N_ENC_OPERANDS
    bw_ref, addd_ref = rest[o], rest[o + 1]
    dstack = rest[o + 2 : o + 2 + _N_DEC_OPERANDS]
    o = o + 2 + _N_DEC_OPERANDS
    wcomp_ref, bcomp_ref = rest[o], rest[o + 1]
    out_ref, res_scr, h_scr, y_scr, m_scr = rest[o + 2 : o + 7]

    xb = x_ref[...]  # (T, IN_PAD) f32 padded tokens

    # --- encode_z1 stack -> memory tokens (z1 head + z1_proj folded) -----
    res_scr[...] = _dot(xb, win1_ref[...]) + add1_ref[...]
    _enc_layers(res_scr, h_scr, y_scr, *e1, n_layers=l1, n_heads=h1, head_dim=d // h1)
    m_scr[...] = (_dot(res_scr[...], aw_ref[...]) + ab_ref[...]).astype(jnp.bfloat16)

    # --- z2 posterior stack (prob row enters the pre-head additively) ----
    res_scr[...] = _dot(xb, win2_ref[...]) + add2_ref[...] + pemb_ref[...]
    _enc_layers(res_scr, h_scr, y_scr, *e2, n_layers=l2, n_heads=h2, head_dim=d // h2)

    # --- z2 = p_mu2 + d_mu2, projected: posterior fold + prior term ------
    res_scr[...] = _dot(res_scr[...], bw_ref[...]) + addd_ref[...] + pz2p_ref[...]

    # --- decoder stack + compress head ------------------------------------
    _dec_layers(res_scr, m_scr, h_scr, y_scr, *dstack, n_layers=ld, n_heads=hd, head_dim=d // hd)
    out_ref[...] = _dot(res_scr[...], wcomp_ref[...]) + bcomp_ref[...]


def _dense(p: dict) -> tuple[Array, Array]:
    return jnp.asarray(p['dense']['kernel']), jnp.asarray(p['dense']['bias'])


def _pad_rows(w: Array, rows: int) -> Array:
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def pack_cvae_cf_params(
    wae_params: dict,
    *,
    z1_dim: int,
    z2_dim: int,
    l1: int,
    l2: int,
    ld: int,
    f1: int,
    f2: int,
    fd: int,
) -> tuple[tuple, tuple]:
    """Fold the CF chain's heads into the stack operands.

    Returns ``(kernel_operands, prob_operands)`` where ``prob_operands`` is
    ``(prior_z2p, wp_kernel, wp_bias)`` for the two tiny XLA-side matmuls
    from ``probs``: ``pemb = probs @ wp_kernel + wp_bias`` and
    ``pz2p = einsum('bc,ctd->btd', probs, prior_z2p)`` (== p_mu2 @ W_z2,
    with the prior bias' contribution folded into the kernel's ``addd``).
    """
    enc = wae_params['encoder']
    post = wae_params['z2_posterior']
    dec = wae_params['decoder']
    prior = wae_params['z2_prior']

    win1, bin1 = _dense(enc['input_proj'])
    t, d_model = enc['positional_encoding'].shape[1:]
    add1 = (jnp.asarray(enc['positional_encoding'][0]) + bin1).astype(jnp.float32)
    e1 = pack_encoder_params([enc[f'layer_{i}'] for i in range(l1)], f1)

    wlat1, blat1 = _dense(enc['to_latent'])
    wz1, bz1 = _dense(dec['z1_proj'])
    aw = (wlat1[:, :z1_dim] @ wz1).astype(jnp.bfloat16)
    ab = (
        (blat1[:z1_dim] @ wz1 + bz1)[None]
        + jnp.asarray(dec['memory_positional_embedding'][0])
    ).astype(jnp.float32)

    win2, bin2 = _dense(post['input_proj'])
    add2 = (jnp.asarray(post['positional_encoding'][0]) + bin2).astype(jnp.float32)
    e2 = pack_encoder_params([post[f'layer_{i}'] for i in range(l2)], f2)

    wlat2, blat2 = _dense(post['to_latent'])
    wz2, bz2 = _dense(dec['z2_proj'])
    bw = (wlat2[:, :z2_dim] @ wz2).astype(jnp.bfloat16)

    # conditional prior: probs @ W_prior + b_prior -> (T, 2*z2); mu slice
    # then z2_proj. As a function of probs this is one (C, T, d) tensor plus
    # a constant row that folds into the decoder pre-head additive.
    wprior, bprior = _dense(prior['prior'])
    n_classes = wprior.shape[0]
    wprior_mu = wprior.reshape(n_classes, t, 2 * z2_dim)[:, :, :z2_dim]
    bprior_mu = bprior.reshape(t, 2 * z2_dim)[:, :z2_dim]
    prior_z2p = jnp.einsum('ctz,zd->ctd', wprior_mu, wz2).astype(jnp.float32)

    addd = (
        jnp.asarray(dec['positional_embedding'][0])
        + (blat2[:z2_dim] @ wz2 + bz2)[None]
        + bprior_mu @ wz2
    ).astype(jnp.float32)
    dstack = pack_decoder_params([dec[f'layer_{i}'] for i in range(ld)], fd)

    wcomp, bcomp = _dense(dec['compress'])
    d_out = wcomp.shape[1]
    wcomp_pad = jnp.pad(wcomp, ((0, 0), (0, _IN_PAD - d_out))).astype(jnp.bfloat16)
    bcomp_pad = jnp.pad(bcomp, (0, _IN_PAD - d_out))[None].astype(jnp.float32)

    wp, bp = _dense(post['prob_proj'])

    operands = (
        _pad_rows(win1, _IN_PAD).astype(jnp.bfloat16), add1, *e1,
        aw, ab,
        _pad_rows(win2, _IN_PAD).astype(jnp.bfloat16), add2, *e2,
        bw, addd, *dstack,
        wcomp_pad, bcomp_pad,
    )
    return operands, (prior_z2p, jnp.asarray(wp), jnp.asarray(bp))


def _const_spec(arr: Array) -> pl.BlockSpec:
    n = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i, *, _n=n: (0,) * _n, memory_space=pltpu.VMEM)


def cvae_cf_tpu(
    x: Array,
    probs: Array,
    operands: tuple,
    prob_operands: tuple,
    *,
    heads: tuple[int, int, int],
    n_layers: tuple[int, int, int],
    embedding_dim: int,
) -> Array:
    """Fused counterfactual CVAE chain: ``(B, T, e) tokens -> (B, T, e)``.

    ``probs`` are the already-interpolated class probabilities.
    """
    b, t, e = x.shape
    d = operands[1].shape[-1]
    l1, l2, ld = n_layers
    h1, h2, hd = heads
    prior_z2p, wp, bp = prob_operands

    x_pad = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, _IN_PAD - e)))
    pemb = (probs @ wp + bp)[:, None, :]  # (B, 1, d)
    pz2p = jnp.einsum('bc,ctd->btd', probs, prior_z2p)  # (B, T, d)

    kernel = functools.partial(_cvae_kernel, l1=l1, l2=l2, ld=ld, h1=h1, h2=h2, hd=hd, d=d)
    f_max = operands[2 + _N_ENC_OPERANDS - 4].shape[-1]  # e1 w1: (L, d, f_max)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t, _IN_PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[_const_spec(p) for p in operands],
        ],
        out_specs=pl.BlockSpec((None, t, _IN_PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, _IN_PAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.float32),  # residual stream
            pltpu.VMEM((t, d), jnp.bfloat16),  # normed-input scratch
            pltpu.VMEM((t, d), jnp.float32),  # attention accumulator
            pltpu.VMEM((t, d), jnp.bfloat16),  # memory tokens
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(
                b * ((l1 + l2) * (8 * t * d * d + 4 * t * t * d)
                     + ld * (14 * t * d * d + 8 * t * t * d)
                     + 6 * t * d * d)
            ),
            bytes_accessed=int(
                b * t * (d * 4 * 2 + _IN_PAD * 8)
                + sum(p.size * p.dtype.itemsize for p in operands)
            ),
            transcendentals=int(b * (l1 + l2 + 2 * ld) * t * t + b * (l1 + l2 + ld) * t * f_max),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
    )(x_pad, pemb, pz2p, *operands)
    return out[:, :, :embedding_dim]
