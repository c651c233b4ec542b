"""EdgeConv restructure equivalence: gather-of-dense == dense-of-edge-features."""

import numpy as np
import jax
import jax.numpy as jnp

from pccf.kernels import ops
from pccf.nn.encoders import EdgeConvBlock


def test_edgeconv_matches_direct_formulation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 6)).astype(np.float32))
    block = EdgeConvBlock(features=8, k=4, act=lambda v: jax.nn.leaky_relu(v, 0.2))
    variables = block.init({'params': jax.random.key(0)}, x, None, train=False)
    out = block.apply(variables, x, None, train=False)

    # direct reference formulation with the same kernel
    kernel = np.asarray(variables['params']['kernel'])  # (2C, F)
    idx = np.asarray(ops.knn(x, 4))
    feats = np.asarray(ops.edge_features(x, jnp.asarray(idx)))  # (B,N,k,2C)
    pre = feats @ kernel
    # BN at init: running stats are mean 0 var 1 -> identity (eps only)
    scale = 1.0 / np.sqrt(1.0 + 1e-5)
    pre = pre * scale
    want = np.max(np.where(pre > 0, pre, 0.2 * pre), axis=2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
