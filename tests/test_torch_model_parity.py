"""Full-model fidelity: jax classifier forward vs an independent torch oracle.

The oracle re-states the reference DGCNN classifier semantics
(classifier.py:48-66: EdgeConv stacks with BN+LeakyReLU and max over k,
final conv+BN, global max+avg pooling, BN MLP) in torch, channels-first,
with weights copied from the jax model.  Both get the same precomputed
neighbour indices, isolating network semantics from kNN tie-breaking.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from pccf.config import get_config_all
from pccf.data.structures import Inputs
from pccf.kernels import ops
from pccf.nn import get_classifier

OVERRIDES = [
    'data.n_input_points=64',
    'data.n_neighbors=6',
    'classifier.model.n_neighbors=6',
    'classifier.model.conv_dims=[8,16]',
    'classifier.model.mlp_dims=[16,8]',
    'classifier.model.feature_dim=16',
    'classifier.model.dropout_rates=[0.0,0.0]',
]


def _bn_eval(z, scale, bias, mean, var, eps=1e-5, axis=1):
    """BatchNorm eval transform, torch layout (B, C, ...)."""
    shape = [1] * z.ndim
    shape[axis] = -1
    return (z - mean.view(shape)) / torch.sqrt(var.view(shape) + eps) * scale.view(shape) + bias.view(shape)


def _randomize_bn(variables, rng):
    """Give BN layers non-trivial running stats and affine params so the
    parity test exercises the normalisation, not just identity."""
    import flax

    flat_p = flax.traverse_util.flatten_dict(variables['params'])
    flat_s = flax.traverse_util.flatten_dict(variables['batch_stats'])
    for key, val in list(flat_p.items()):
        if ('bn' in key and key[-1] in ('scale', 'bias')) or key[-1] in ('bn_scale', 'bn_bias'):
            flat_p[key] = jnp.asarray(rng.uniform(0.5, 1.5, val.shape).astype(np.float32))
    for key, val in list(flat_s.items()):
        if key[-1] in ('mean', 'bn_mean'):
            flat_s[key] = jnp.asarray(rng.normal(0, 0.1, val.shape).astype(np.float32))
        if key[-1] in ('var', 'bn_var'):
            flat_s[key] = jnp.asarray(rng.uniform(0.5, 2.0, val.shape).astype(np.float32))
    return {
        'params': flax.traverse_util.unflatten_dict(flat_p),
        'batch_stats': flax.traverse_util.unflatten_dict(flat_s),
    }


def test_classifier_forward_matches_torch_oracle():
    cfg = get_config_all(OVERRIDES)
    model = get_classifier(cfg)
    rng = np.random.default_rng(0)
    cloud = rng.standard_normal((2, 64, 3)).astype(np.float32)
    idx = np.asarray(ops.knn(jnp.asarray(cloud), 6))

    variables = model.init(
        {'params': jax.random.key(0), 'dropout': jax.random.key(1)},
        Inputs(cloud=jnp.asarray(cloud), indices=jnp.asarray(idx)),
        train=False,
    )
    variables = _randomize_bn(variables, rng)

    # NOTE: the jax model recomputes kNN dynamically after block 0; for a
    # deterministic oracle we only compare with the same idx everywhere, so
    # monkey-patch the dynamic knn to return the precomputed indices.
    import pccf.nn.encoders as enc

    orig_knn = enc.kapi.knn
    enc.kapi.knn = lambda x, k, **kw: jnp.asarray(idx)
    try:
        logits_jax = np.asarray(
            model.apply(variables, Inputs(cloud=jnp.asarray(cloud), indices=jnp.asarray(idx)), train=False)
        )
    finally:
        enc.kapi.knn = orig_knn

    # ---- torch oracle (channels-first reference formulas) -----------------
    p = variables['params']
    s = variables['batch_stats']
    t_cloud = torch.from_numpy(cloud)  # (B, N, 3)
    t_idx = torch.from_numpy(idx.astype(np.int64))
    x = t_cloud.transpose(2, 1)  # (B, C, N)

    def get_neighbours(x, indices):
        b, c, n = x.shape
        k = indices.shape[-1]
        flat = indices.reshape(b, 1, n * k).expand(-1, c, -1)
        return torch.gather(x, 2, flat).view(b, c, n, k)

    def edge_conv(x, blk_p, blk_s):
        nbr = get_neighbours(x, t_idx)  # (B, C, N, k)
        center = x.unsqueeze(3).expand_as(nbr)
        feats = torch.cat([nbr - center, center], dim=1)  # (B, 2C, N, k)
        w = torch.from_numpy(np.asarray(blk_p['kernel']))  # (2C, F)
        z = torch.einsum('bcnk,cf->bfnk', feats, w)
        z = _bn_eval(
            z,
            torch.from_numpy(np.asarray(blk_p['bn_scale'])),
            torch.from_numpy(np.asarray(blk_p['bn_bias'])),
            torch.from_numpy(np.asarray(blk_s['bn_mean'])),
            torch.from_numpy(np.asarray(blk_s['bn_var'])),
        )
        z = torch.nn.functional.leaky_relu(z, 0.2)
        return z.max(dim=3)[0]  # (B, F, N)

    xs = []
    for i in range(2):
        x = edge_conv(x, p[f'edge_conv_{i}'], s[f'edge_conv_{i}'])
        xs.append(x)
    x = torch.cat(xs, dim=1)
    w = torch.from_numpy(np.asarray(p['final_conv']['dense']['kernel']))  # (in, F)
    x = torch.einsum('bcn,cf->bfn', x, w)
    x = _bn_eval(
        x,
        torch.from_numpy(np.asarray(p['final_conv']['bn']['scale'])),
        torch.from_numpy(np.asarray(p['final_conv']['bn']['bias'])),
        torch.from_numpy(np.asarray(s['final_conv']['bn']['mean'])),
        torch.from_numpy(np.asarray(s['final_conv']['bn']['var'])),
    )
    pooled = torch.cat([x.max(dim=2)[0], x.mean(dim=2)], dim=1)  # (B, 2F)

    def dense_block(z, blk_p, blk_s=None, act=True):
        w = torch.from_numpy(np.asarray(blk_p['dense']['kernel']))
        z = z @ w
        if 'bias' in blk_p['dense']:
            z = z + torch.from_numpy(np.asarray(blk_p['dense']['bias']))
        if blk_s is not None:
            z = _bn_eval(
                z,
                torch.from_numpy(np.asarray(blk_p['bn']['scale'])),
                torch.from_numpy(np.asarray(blk_p['bn']['bias'])),
                torch.from_numpy(np.asarray(blk_s['bn']['mean'])),
                torch.from_numpy(np.asarray(blk_s['bn']['var'])),
                axis=1,
            )
        if act:
            z = torch.nn.functional.leaky_relu(z, 0.2)
        return z

    mlp_p = p['mlp']
    mlp_s = s['mlp']
    z = dense_block(pooled, mlp_p['DenseBlock_0'], mlp_s['DenseBlock_0'])
    z = dense_block(z, mlp_p['DenseBlock_1'], mlp_s['DenseBlock_1'])
    logits_torch = dense_block(z, mlp_p['DenseBlock_2'], None, act=False).numpy()

    np.testing.assert_allclose(logits_jax, logits_torch, atol=2e-4, rtol=1e-4)
