"""Expert-parallel PCGen: component-axis sharding matches replicated numerics."""

import numpy as np
import jax
import jax.numpy as jnp

from pccf.dist.sharding import make_2d_mesh, shard_variables_ep
from pccf.nn.decoders import PCGenDecoder

G = 8
N = 64


def _decoder_and_vars():
    dec = PCGenDecoder(
        w_dim=32,
        sample_dim=4,
        n_components=G,
        map_dims=(8,),
        conv_dims=(16, 8),
        tau=5.0,
        act=jax.nn.relu,
        act_name='ReLU',
        filtering=False,
    )
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 32)).astype(np.float32))
    samp = jnp.asarray(np.random.default_rng(1).standard_normal((4, N, 4)).astype(np.float32))
    variables = dec.init({'params': jax.random.key(0), 'sampling': jax.random.key(1)}, w, N, samp)
    return dec, variables, w, samp


def test_ep_forward_matches_replicated():
    dec, variables, w, samp = _decoder_and_vars()
    mesh = make_2d_mesh(8, mp=4)
    ep_vars = shard_variables_ep(variables, mesh, n_components=G)

    # the component-stack leaves are sharded on the leading (component) axis
    kern = ep_vars['params']['components']['conv_0']['dense']['kernel']
    assert kern.sharding.shard_shape(kern.shape)[0] == G // 4

    @jax.jit
    def fwd(v, w, samp):
        return dec.apply(v, w, N, samp, train=False)

    out_rep = np.asarray(fwd(variables, w, samp))
    out_ep = np.asarray(fwd(ep_vars, w, samp))
    np.testing.assert_allclose(out_ep, out_rep, rtol=1e-5, atol=1e-6)


def test_ep_grad_step_matches_replicated():
    dec, variables, w, samp = _decoder_and_vars()
    mesh = make_2d_mesh(8, mp=4)
    ep_vars = shard_variables_ep(variables, mesh, n_components=G)
    target = jnp.asarray(np.random.default_rng(2).standard_normal((4, N, 3)).astype(np.float32))

    @jax.jit
    def loss_grad(params, stats, w, samp):
        def loss(p):
            recon = dec.apply({'params': p, 'batch_stats': stats}, w, N, samp, train=False)
            return jnp.mean((recon - target) ** 2)

        return jax.value_and_grad(loss)(params)

    v_rep, g_rep = loss_grad(variables['params'], variables['batch_stats'], w, samp)
    v_ep, g_ep = loss_grad(ep_vars['params'], ep_vars['batch_stats'], w, samp)
    np.testing.assert_allclose(float(v_ep), float(v_rep), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_rep), strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # expert gradients stay sharded on the component axis (no resharding)
    gk = g_ep['components']['conv_0']['dense']['kernel']
    assert gk.sharding.shard_shape(gk.shape)[0] == G // 4
