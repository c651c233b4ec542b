"""Inner (W-space) networks: encoders, decoders, conditional nets.

Reference: src/module/w_encoders.py, w_decoders.py, w_conditional.py.
All operate on the code axis: inputs ``(B, n_codes, embedding_dim)``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pccf.kernels import api as kapi
from pccf.nn.layers import DenseBlock, TransformerDecoderLayer, TransformerEncoderLayer

Array = jax.Array


def _packed_stack(module, pack_fn, n_layers: int, f_max: int):
    """Packed kernel operands for the fused transformer stack.

    Packing (stack/transpose/pad of the whole weight set) is pure jnp on the
    *params*, which are runtime arguments under jit — so done inline it
    re-executes on every forward call.  Serving avoids that recurring cost
    by applying once with ``mutable=['packed']`` (see
    :meth:`pccf.serve.CounterfactualServer`): the operands land in the
    ``packed`` variable collection and later calls read them back.  Callers
    that never prepack (tests, evaluation runners) keep the inline path.
    The cache is only valid while params are frozen — training never writes
    it (the fused path is eval-only)."""
    if module.has_variable('packed', 'stack'):
        return module.get_variable('packed', 'stack')
    p = module.variables['params']
    packed = pack_fn([p[f'layer_{i}'] for i in range(n_layers)], f_max)
    if module.is_mutable_collection('packed'):
        module.put_variable('packed', 'stack', packed)
    return packed


def _fused_stack_ok(module, train: bool) -> bool:
    """Dispatch the fused Pallas transformer-stack kernel (eval only).

    Init keeps the XLA path so the full param tree is materialised; the
    activation must be the shared exact-GELU callable the kernel hard-codes
    (anything else keeps the XLA path)."""
    from pccf.kernels.pallas_wformer import wformer_supported
    from pccf.nn.layers import gelu_exact

    return (
        not train
        and not module.is_initializing()
        and module.act is gelu_exact
        and kapi.use_pallas()
        and wformer_supported(
            module.n_codes,
            module.proj_dim,
            max(module.mlp_dims),
            len(module.mlp_dims),
            module.n_heads,
        )
    )


class ConvolutionalWEncoder(nn.Module):
    """Per-code dense stack (reference w_encoders.py:53-71)."""

    z1_dim: int
    conv_dims: tuple[int, ...]

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # act=None is deliberate parity: the reference builds these as
        # PointsConvLayer(in, out) with act_cls defaulting to None
        # (layers.py:98,114-115) — dense+BN stacks with no nonlinearity
        for i, f in enumerate(self.conv_dims):
            x = DenseBlock(f, act=None, name=f'conv_{i}')(x, train)
        return DenseBlock(2 * self.z1_dim, act=None, batch_norm=False, soft_init=True, name='head')(
            x, train
        )


class TransformerWEncoder(nn.Module):
    """Token-per-code transformer encoder (reference w_encoders.py:74-106)."""

    z1_dim: int
    n_codes: int
    proj_dim: int
    n_heads: int
    mlp_dims: tuple[int, ...]
    dropout_rates: tuple[float, ...]
    act: Callable

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = DenseBlock(self.proj_dim, act=None, batch_norm=False, name='input_proj')(x, train)
        pos = self.param('positional_encoding', nn.initializers.normal(1.0), (1, self.n_codes, self.proj_dim))
        x = x + pos
        if _fused_stack_ok(self, train):
            from pccf.kernels.pallas_wformer import pack_encoder_params, wformer_encoder_tpu

            packed = _packed_stack(self, pack_encoder_params, len(self.mlp_dims), max(self.mlp_dims))
            x = wformer_encoder_tpu(x, packed, n_heads=self.n_heads)
        else:
            rates = list(self.dropout_rates) + [0.0] * len(self.mlp_dims)
            for i, d_ff in enumerate(self.mlp_dims):
                x = TransformerEncoderLayer(
                    self.proj_dim, self.n_heads, d_ff, rates[i], self.act, name=f'layer_{i}'
                )(x, train)
        return DenseBlock(2 * self.z1_dim, act=None, batch_norm=False, soft_init=True, name='to_latent')(
            x, train
        )


class LinearWDecoder(nn.Module):
    """Grouped per-code MLP decoder (reference w_decoders.py:44-62)."""

    w_dim: int
    n_codes: int
    mlp_dims: tuple[int, ...]
    dropout_rates: tuple[float, ...]
    act: Callable
    act_name: str = ''

    @nn.compact
    def __call__(self, z1: Array, z2: Array, train: bool = False) -> Array:
        if z1.shape[1] == 1 and z2.shape[1] != 1:
            # prior-sampled z1 arrives (B, 1, z1_dim) (sample_z1_prior with
            # n_pseudo_inputs=0); broadcast across codes like the
            # transformer decoder does
            z1 = jnp.broadcast_to(z1, (z1.shape[0], z2.shape[1], z1.shape[-1]))
        z = jnp.concatenate([z1, z2], axis=-1)  # (B, n_codes, z1+z2)
        x = z.reshape(z.shape[0], 1, -1)  # (B, 1, n_codes*(z1+z2))
        rates = list(self.dropout_rates) + [0.0] * len(self.mlp_dims)
        for i, f in enumerate(self.mlp_dims):
            x = DenseBlock(
                f, act=self.act, act_name=self.act_name, groups=self.n_codes, name=f'mlp_{i}'
            )(x, train)
            x = nn.Dropout(rates[i], deterministic=not train)(x)
        x = DenseBlock(self.w_dim, act=None, batch_norm=False, groups=self.n_codes, name='head')(x, train)
        return x[:, 0, :]  # (B, w_dim)


class TransformerWDecoder(nn.Module):
    """z1 as memory, z2 as target tokens; cross-attention decoder
    (reference w_decoders.py:65-101)."""

    embedding_dim: int
    n_codes: int
    proj_dim: int
    n_heads: int
    mlp_dims: tuple[int, ...]
    dropout_rates: tuple[float, ...]
    act: Callable

    @nn.compact
    def __call__(self, z1: Array, z2: Array, train: bool = False) -> Array:
        batch = z1.shape[0]
        # note: the reference sizes z1_proj by z2_dim (w_decoders.py:70); the
        # configs keep z1_dim == z2_dim so behaviour is identical (the latent
        # dims arrive through the z1/z2 array shapes, not module fields).
        # z1 may be (B, 1, z1_dim) when sampled from the unconditional prior
        # (w_autoencoders.py:226); broadcast across code tokens.
        z1p = DenseBlock(self.proj_dim, act=None, batch_norm=False, name='z1_proj')(z1, train)
        z2p = DenseBlock(self.proj_dim, act=None, batch_norm=False, name='z2_proj')(z2, train)
        mem_pos = self.param(
            'memory_positional_embedding', nn.initializers.normal(1.0), (1, self.n_codes, self.proj_dim)
        )
        pos = self.param(
            'positional_embedding', nn.initializers.normal(1.0), (1, self.n_codes, self.proj_dim)
        )
        memory = jnp.broadcast_to(z1p, (batch, self.n_codes, self.proj_dim)) + mem_pos
        x = jnp.broadcast_to(z2p, (batch, self.n_codes, self.proj_dim)) + pos
        if _fused_stack_ok(self, train):
            from pccf.kernels.pallas_wformer import pack_decoder_params, wformer_decoder_tpu

            packed = _packed_stack(self, pack_decoder_params, len(self.mlp_dims), max(self.mlp_dims))
            x = wformer_decoder_tpu(x, memory, packed, n_heads=self.n_heads)
        else:
            rates = list(self.dropout_rates) + [0.0] * len(self.mlp_dims)
            for i, d_ff in enumerate(self.mlp_dims):
                x = TransformerDecoderLayer(
                    self.proj_dim, self.n_heads, d_ff, rates[i], self.act, name=f'layer_{i}'
                )(x, memory, train)
        x = DenseBlock(self.embedding_dim, act=None, batch_norm=False, name='compress')(x, train)
        return x.reshape(batch, self.n_codes * self.embedding_dim)


class ConditionalPrior(nn.Module):
    """Linear conditional prior: probs -> per-code (mu, log_var) for z2
    (reference w_conditional.py:13-29)."""

    n_codes: int
    z2_dim: int

    @nn.compact
    def __call__(self, probs: Array, train: bool = False) -> Array:
        x = DenseBlock(self.n_codes * 2 * self.z2_dim, act=None, batch_norm=False, name='prior')(
            probs, train
        )
        return x.reshape(-1, self.n_codes, 2 * self.z2_dim)


class TransformerWConditionalEncoder(nn.Module):
    """Posterior *difference* net conditioned on class probabilities
    (reference w_conditional.py:58-91)."""

    z2_dim: int
    n_codes: int
    proj_dim: int
    n_heads: int
    mlp_dims: tuple[int, ...]
    dropout_rates: tuple[float, ...]
    act: Callable

    @nn.compact
    def __call__(self, probs: Array, x: Array, train: bool = False) -> Array:
        x = DenseBlock(self.proj_dim, act=None, batch_norm=False, name='input_proj')(x, train)
        pos = self.param('positional_encoding', nn.initializers.normal(1.0), (1, self.n_codes, self.proj_dim))
        probs_emb = DenseBlock(self.proj_dim, act=None, batch_norm=False, name='prob_proj')(probs, train)
        x = pos + x + probs_emb[:, None, :]
        if _fused_stack_ok(self, train):
            from pccf.kernels.pallas_wformer import pack_encoder_params, wformer_encoder_tpu

            packed = _packed_stack(self, pack_encoder_params, len(self.mlp_dims), max(self.mlp_dims))
            x = wformer_encoder_tpu(x, packed, n_heads=self.n_heads)
        else:
            rates = list(self.dropout_rates) + [0.0] * len(self.mlp_dims)
            for i, d_ff in enumerate(self.mlp_dims):
                x = TransformerEncoderLayer(
                    self.proj_dim, self.n_heads, d_ff, rates[i], self.act, name=f'layer_{i}'
                )(x, train)
        return DenseBlock(2 * self.z2_dim, act=None, batch_norm=False, soft_init=True, name='to_latent')(
            x, train
        )


def get_w_encoder(cfg) -> nn.Module:
    """Factory (w_encoders.py:109-115). ``cfg`` is the full AllConfig."""
    from pccf.config.options import WEncoders

    wae = cfg.w_autoencoder.model
    we = wae.w_encoder
    if we.class_name == WEncoders.Convolutional:
        return ConvolutionalWEncoder(z1_dim=wae.z1_dim, conv_dims=tuple(we.conv_dims))
    return TransformerWEncoder(
        z1_dim=wae.z1_dim,
        n_codes=cfg.autoencoder.model.n_codes,
        proj_dim=we.proj_dim,
        n_heads=we.n_heads,
        mlp_dims=tuple(we.mlp_dims),
        dropout_rates=tuple(we.dropout_rates),
        act=we.act_cls,
    )


def get_w_decoder(cfg) -> nn.Module:
    """Factory (w_decoders.py:104-110)."""
    from pccf.config.options import WDecoders

    ae = cfg.autoencoder.model
    wae = cfg.w_autoencoder.model
    wd = wae.w_decoder
    if wd.class_name == WDecoders.Linear:
        return LinearWDecoder(
            w_dim=ae.w_dim,
            n_codes=ae.n_codes,
            mlp_dims=tuple(wd.mlp_dims),
            dropout_rates=tuple(wd.dropout_rates),
            act=wd.act_cls,
            act_name=wd.act_name,
        )
    return TransformerWDecoder(
        embedding_dim=ae.embedding_dim,
        n_codes=ae.n_codes,
        proj_dim=wd.proj_dim,
        n_heads=wd.n_heads,
        mlp_dims=tuple(wd.mlp_dims),
        dropout_rates=tuple(wd.dropout_rates),
        act=wd.act_cls,
    )


def get_conditional_w_encoder(cfg) -> nn.Module:
    """Factory (w_conditional.py:94-99)."""
    ae = cfg.autoencoder.model
    wae = cfg.w_autoencoder.model
    cw = wae.conditional_w_encoder
    return TransformerWConditionalEncoder(
        z2_dim=wae.z2_dim,
        n_codes=ae.n_codes,
        proj_dim=cw.proj_dim,
        n_heads=cw.n_heads,
        mlp_dims=tuple(cw.mlp_dims),
        dropout_rates=tuple(cw.dropout_rates),
        act=cw.act_cls,
    )
