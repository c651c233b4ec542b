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


def _materialised_train_oracle(variables, x, k, slope=0.2):
    """Reference train-mode forward: gather -> batch-stat BN -> act -> max."""
    idx = ops.knn(x, k)
    kernel = variables['params']['kernel']
    c = x.shape[-1]
    u = np.asarray(x @ kernel[:c])
    s = np.asarray(x @ (kernel[c:] - kernel[:c]))
    pre = np.asarray(ops.gather_neighbors(jnp.asarray(u), idx)) + s[:, :, None, :]
    mean = pre.mean((0, 1, 2))
    var = (pre**2).mean((0, 1, 2)) - mean**2
    scale = np.asarray(variables['params']['bn_scale'])
    bias = np.asarray(variables['params']['bn_bias'])
    z = (pre - mean) / np.sqrt(var + 1e-5) * scale + bias
    out = np.where(z > 0, z, slope * z).max(axis=2)
    return out, mean, var


def test_streaming_train_path_matches_materialised():
    """Train mode: streaming counts-based BN stats == materialised stats,
    same output, same running-stat update, same gradients."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 6)).astype(np.float32))
    block = EdgeConvBlock(features=8, k=4, act=lambda v: jax.nn.leaky_relu(v, 0.2))
    variables = _randomized_variables(block, x, rng)
    params = dict(variables['params'])
    params['bn_scale'] = params['bn_scale'].at[1].set(-0.6)  # negative scale too
    variables = {'params': params, 'batch_stats': variables['batch_stats']}

    out, updates = block.apply(variables, x, None, train=True, mutable=['batch_stats'])
    want, mean, var = _materialised_train_oracle(variables, x, 4)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)

    momentum = 0.9
    ra_mean = np.asarray(variables['batch_stats']['bn_mean'])
    ra_var = np.asarray(variables['batch_stats']['bn_var'])
    np.testing.assert_allclose(
        np.asarray(updates['batch_stats']['bn_mean']),
        momentum * ra_mean + (1 - momentum) * mean,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updates['batch_stats']['bn_var']),
        momentum * ra_var + (1 - momentum) * var,
        atol=1e-5,
    )

    # gradients through the streaming stats must match the materialised path
    def loss_streaming(xx):
        o, _ = block.apply(variables, xx, None, train=True, mutable=['batch_stats'])
        return jnp.sum(o**2)

    def loss_materialised(xx):
        idx = ops.knn(xx, 4)
        kernel = variables['params']['kernel']
        c = xx.shape[-1]
        u = xx @ kernel[:c]
        s = xx @ (kernel[c:] - kernel[:c])
        pre = ops.gather_neighbors(u, idx) + s[:, :, None, :]
        mean = jnp.mean(pre, axis=(0, 1, 2))
        var = jnp.mean(pre**2, axis=(0, 1, 2)) - mean**2
        z = (pre - mean) * jax.lax.rsqrt(var + 1e-5) * variables['params']['bn_scale']
        z = z + variables['params']['bn_bias']
        o = jnp.max(jnp.where(z > 0, z, 0.2 * z), axis=2)
        return jnp.sum(o**2)

    g1 = jax.grad(loss_streaming)(x)
    g2 = jax.grad(loss_materialised)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-4)


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


class TestPrecomputedIndexWidth:
    def test_wider_precomputed_indices_are_sliced_to_k(self):
        """A block with k=8 receiving the dataset's wider (e.g. k=12)
        precompute must use exactly its own k (the distance-sorted prefix),
        not silently pool over all 12 neighbours (regression: the classifier
        k=20 consumed the data.n_neighbors=25 precompute verbatim)."""
        from pccf.kernels import api as kapi
        from pccf.nn.encoders import EdgeConvBlock

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
        block = EdgeConvBlock(16, 8, act=None, act_name='')
        variables = block.init(jax.random.key(0), x, None, train=False)
        dynamic = block.apply(variables, x, None, train=False)
        wide_idx = kapi.knn(x, 12)
        sliced = block.apply(variables, x, wide_idx, train=False)
        np.testing.assert_allclose(np.asarray(sliced), np.asarray(dynamic), atol=1e-6)
        # too-narrow precompute falls back to recomputing at the right k
        narrow = block.apply(variables, x, kapi.knn(x, 4), train=False)
        np.testing.assert_allclose(np.asarray(narrow), np.asarray(dynamic), atol=1e-6)
