"""Pipeline-parallel layer stacks: sequential equivalence + sharded training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from pccf.dist.pp import pipeline_apply, shard_stacked_params, stack_layer_params
from pccf.nn.layers import TransformerDecoderLayer, TransformerEncoderLayer, gelu_exact

D, HEADS, FF, B, T = 16, 2, 32, 8, 12
L = 4


def _mesh_pp(pp=4) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:pp]).reshape(pp), ('pp',))


def _enc_stack(seed=0):
    layer = TransformerEncoderLayer(D, HEADS, FF, 0.0, gelu_exact)
    x = jnp.asarray(np.random.default_rng(seed).standard_normal((B, T, D)).astype(np.float32))
    params = [
        layer.init(jax.random.key(i), x)['params'] for i in range(L)
    ]
    return layer, params, x


def test_pipeline_matches_sequential():
    layer, params, x = _enc_stack()
    mesh = _mesh_pp(4)
    stacked = shard_stacked_params(stack_layer_params(params), mesh)

    def layer_fn(p, h):
        return layer.apply({'params': p}, h)

    want = x
    for p in params:
        want = layer_fn(p, want)
    got = pipeline_apply(layer_fn, stacked, x, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pipeline_microbatch_counts():
    layer, params, x = _enc_stack(seed=1)
    mesh = _mesh_pp(2)
    stacked = stack_layer_params(params)

    def layer_fn(p, h):
        return layer.apply({'params': p}, h)

    want = x
    for p in params:
        want = layer_fn(p, want)
    for m in (2, 4, 8):
        got = pipeline_apply(layer_fn, stacked, x, mesh, n_micro=m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pipeline_with_cross_attention_memory():
    layer = TransformerDecoderLayer(D, HEADS, FF, 0.0, gelu_exact)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    mem = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    params = [layer.init(jax.random.key(i), x, mem)['params'] for i in range(L)]
    mesh = _mesh_pp(4)
    stacked = stack_layer_params(params)

    def layer_fn(p, h, memory):
        return layer.apply({'params': p}, h, memory)

    want = x
    for p in params:
        want = layer_fn(p, want, mem)
    got = pipeline_apply(layer_fn, stacked, x, mesh, n_micro=4, extra=mem)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pipeline_nonuniform_ff_padding():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    widths = [32, 16, 32, 16]
    layers = [TransformerEncoderLayer(D, HEADS, w, 0.0, gelu_exact) for w in widths]
    params = [l.init(jax.random.key(i), x)['params'] for i, l in enumerate(layers)]
    mesh = _mesh_pp(2)
    stacked = stack_layer_params(params)
    wide = TransformerEncoderLayer(D, HEADS, max(widths), 0.0, gelu_exact)

    def layer_fn(p, h):
        return wide.apply({'params': p}, h)

    want = x
    for l, p in zip(layers, params, strict=True):
        want = l.apply({'params': p}, want)
    got = pipeline_apply(layer_fn, stacked, x, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pipeline_training_grads_match_sequential():
    layer, params, x = _enc_stack(seed=4)
    mesh = _mesh_pp(4)
    stacked = shard_stacked_params(stack_layer_params(params), mesh)
    target = jnp.asarray(np.random.default_rng(5).standard_normal((B, T, D)).astype(np.float32))

    def layer_fn(p, h):
        return layer.apply({'params': p}, h)

    def pp_loss(sp):
        out = pipeline_apply(layer_fn, sp, x, mesh, n_micro=4)
        return jnp.mean((out - target) ** 2)

    def seq_loss(plist):
        h = x
        for p in plist:
            h = layer_fn(p, h)
        return jnp.mean((h - target) ** 2)

    v_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(stacked)
    v_seq, g_seq = jax.jit(jax.value_and_grad(seq_loss))(params)
    np.testing.assert_allclose(float(v_pp), float(v_seq), rtol=1e-5)
    g_seq_stacked = stack_layer_params(list(g_seq))
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq_stacked), strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    # stage gradients stay sharded on the layer axis
    lead = jax.tree.leaves(g_pp)[0]
    assert lead.sharding.shard_shape(lead.shape)[0] == L // 4


def test_pipeline_validates():
    layer, params, x = _enc_stack(seed=6)
    mesh = _mesh_pp(4)
    stacked = stack_layer_params(params[:3])  # 3 layers on 4 stages

    def layer_fn(p, h):
        return layer.apply({'params': p}, h)

    with pytest.raises(ValueError, match='not divisible'):
        pipeline_apply(layer_fn, stacked, x, mesh)
