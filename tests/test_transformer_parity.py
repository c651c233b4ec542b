"""Transformer layer fidelity vs torch.nn.Transformer{Encoder,Decoder}Layer.

The reference W-nets are built on torch's pre-norm transformer layers
(w_encoders.py:83-92, w_decoders.py:76-85).  These tests copy weights from
the flax modules into the torch layers and compare outputs.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from pccf.nn.layers import TransformerDecoderLayer, TransformerEncoderLayer

D_MODEL, HEADS, D_FF, B, N = 16, 4, 32, 2, 6


def _mha_to_torch(params, mha: torch.nn.MultiheadAttention):
    """Copy flax MultiHeadDotProductAttention weights into torch MHA."""
    d = D_MODEL

    def qkv(name):
        k = np.asarray(params[name]['kernel']).reshape(d, d)  # (E, H, hd) -> (E, E)
        b = np.asarray(params[name]['bias']).reshape(d)
        return k, b

    qk, qb = qkv('query')
    kk, kb = qkv('key')
    vk, vb = qkv('value')
    # torch in_proj computes x @ W^T with W (3E, E): rows are output dims
    in_proj = np.concatenate([qk.T, kk.T, vk.T], axis=0)
    in_bias = np.concatenate([qb, kb, vb], axis=0)
    out_k = np.asarray(params['out']['kernel']).reshape(d, d)  # (H, hd, E) -> (E, E)
    out_b = np.asarray(params['out']['bias'])
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(in_proj))
        mha.in_proj_bias.copy_(torch.from_numpy(in_bias))
        mha.out_proj.weight.copy_(torch.from_numpy(out_k.T))
        mha.out_proj.bias.copy_(torch.from_numpy(out_b))


def _dense_to_torch(params, linear: torch.nn.Linear):
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(np.asarray(params['kernel']).T))
        linear.bias.copy_(torch.from_numpy(np.asarray(params['bias'])))


def _ln_to_torch(params, ln: torch.nn.LayerNorm):
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(np.asarray(params['scale'])))
        ln.bias.copy_(torch.from_numpy(np.asarray(params['bias'])))


def test_encoder_layer_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N, D_MODEL)).astype(np.float32)
    layer = TransformerEncoderLayer(D_MODEL, HEADS, D_FF, dropout=0.0, act=lambda v: jax.nn.gelu(v, approximate=False))
    variables = layer.init({'params': jax.random.key(0)}, jnp.asarray(x), train=False)
    out_jax = np.asarray(layer.apply(variables, jnp.asarray(x), train=False))

    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=D_MODEL, nhead=HEADS, dim_feedforward=D_FF, dropout=0.0,
        activation=torch.nn.GELU(), batch_first=True, norm_first=True,
    ).eval()
    p = variables['params']
    _mha_to_torch(p['MultiHeadDotProductAttention_0'], t_layer.self_attn)
    _dense_to_torch(p['Dense_0'], t_layer.linear1)
    _dense_to_torch(p['Dense_1'], t_layer.linear2)
    _ln_to_torch(p['LayerNorm_0'], t_layer.norm1)
    _ln_to_torch(p['LayerNorm_1'], t_layer.norm2)
    with torch.no_grad():
        out_torch = t_layer(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out_jax, out_torch, atol=1e-4)


def test_decoder_layer_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, N, D_MODEL)).astype(np.float32)
    mem = rng.standard_normal((B, N, D_MODEL)).astype(np.float32)
    layer = TransformerDecoderLayer(D_MODEL, HEADS, D_FF, dropout=0.0, act=lambda v: jax.nn.gelu(v, approximate=False))
    variables = layer.init({'params': jax.random.key(0)}, jnp.asarray(x), jnp.asarray(mem), train=False)
    out_jax = np.asarray(layer.apply(variables, jnp.asarray(x), jnp.asarray(mem), train=False))

    t_layer = torch.nn.TransformerDecoderLayer(
        d_model=D_MODEL, nhead=HEADS, dim_feedforward=D_FF, dropout=0.0,
        activation=torch.nn.GELU(), batch_first=True, norm_first=True,
    ).eval()
    p = variables['params']
    _mha_to_torch(p['MultiHeadDotProductAttention_0'], t_layer.self_attn)
    _mha_to_torch(p['MultiHeadDotProductAttention_1'], t_layer.multihead_attn)
    _dense_to_torch(p['Dense_0'], t_layer.linear1)
    _dense_to_torch(p['Dense_1'], t_layer.linear2)
    _ln_to_torch(p['LayerNorm_0'], t_layer.norm1)
    _ln_to_torch(p['LayerNorm_1'], t_layer.norm2)
    _ln_to_torch(p['LayerNorm_2'], t_layer.norm3)
    with torch.no_grad():
        out_torch = t_layer(torch.from_numpy(x), torch.from_numpy(mem)).numpy()
    np.testing.assert_allclose(out_jax, out_torch, atol=1e-4)
