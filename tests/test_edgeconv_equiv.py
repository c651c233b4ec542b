"""EdgeConv restructure equivalence: gather-of-dense == dense-of-edge-features."""

import numpy as np
import jax
import jax.numpy as jnp

from pccf.kernels import ops
from pccf.nn.encoders import EdgeConvBlock


def _randomized_variables(block, x, rng):
    variables = block.init({'params': jax.random.key(0)}, x, None, train=False)
    variables = jax.tree.map(lambda v: v, variables)  # unfreeze-safe copy
    stats = dict(variables['batch_stats'])
    params = dict(variables['params'])
    f = params['bn_scale'].shape[0]
    params['bn_scale'] = jnp.asarray(rng.uniform(0.5, 1.5, f).astype(np.float32))
    params['bn_bias'] = jnp.asarray(rng.normal(0, 0.1, f).astype(np.float32))
    stats['bn_mean'] = jnp.asarray(rng.normal(0, 0.1, f).astype(np.float32))
    stats['bn_var'] = jnp.asarray(rng.uniform(0.5, 1.5, f).astype(np.float32))
    return {'params': params, 'batch_stats': stats}


def test_edgeconv_matches_direct_formulation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 6)).astype(np.float32))
    block = EdgeConvBlock(features=8, k=4, act=lambda v: jax.nn.leaky_relu(v, 0.2))
    variables = _randomized_variables(block, x, rng)
    out = block.apply(variables, x, None, train=False)

    # direct reference formulation with the same kernel and BN affine
    kernel = np.asarray(variables['params']['kernel'])  # (2C, F)
    idx = np.asarray(ops.knn(x, 4))
    feats = np.asarray(ops.edge_features(x, jnp.asarray(idx)))  # (B,N,k,2C)
    pre = feats @ kernel
    scale = np.asarray(variables['params']['bn_scale'])
    bias = np.asarray(variables['params']['bn_bias'])
    mean = np.asarray(variables['batch_stats']['bn_mean'])
    var = np.asarray(variables['batch_stats']['bn_var'])
    pre = (pre - mean) / np.sqrt(var + 1e-5) * scale + bias
    want = np.max(np.where(pre > 0, pre, 0.2 * pre), axis=2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_eval_fast_path_equals_standard_path():
    # the folded-affine/max-swap path must equal the materialised path,
    # including with negative BN scales (fold handles sign; act stays last)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 6)).astype(np.float32))
    block = EdgeConvBlock(features=8, k=4, act=lambda v: jax.nn.leaky_relu(v, 0.2))
    variables = _randomized_variables(block, x, rng)
    params = dict(variables['params'])
    params['bn_scale'] = params['bn_scale'].at[0].set(-0.7)  # negative scale
    variables = {'params': params, 'batch_stats': variables['batch_stats']}
    fast = block.apply(variables, x, None, train=False)

    # oracle: explicit materialised computation (gather -> BN -> act -> max)
    idx = ops.knn(x, 4)
    kernel = variables['params']['kernel']
    c = x.shape[-1]
    u = x @ kernel[:c]
    s = x @ (kernel[c:] - kernel[:c])
    pre = np.asarray(ops.gather_neighbors(u, idx)) + np.asarray(s)[:, :, None, :]
    scale = np.asarray(params['bn_scale'])
    bias = np.asarray(params['bn_bias'])
    mean = np.asarray(variables['batch_stats']['bn_mean'])
    var = np.asarray(variables['batch_stats']['bn_var'])
    pre = (pre - mean) / np.sqrt(var + 1e-5) * scale + bias
    want = np.where(pre > 0, pre, 0.2 * pre).max(axis=2)
    np.testing.assert_allclose(np.asarray(fast), want, atol=1e-5)
