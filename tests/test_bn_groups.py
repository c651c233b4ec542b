"""Grouped (per-replica) BatchNorm semantics: PCCF_BN_GROUPS=G.

The reference trains under DDP WITHOUT SyncBatchNorm (src/utils/parallel.py:
17-66), so every replica normalises with its local batch's statistics.
pccf's default is global-batch stats (GSPMD semantics); ``PCCF_BN_GROUPS=G``
reproduces the reference behavior exactly: group g = replica g's local
batch.  These tests pin the defining property — a G-group run equals G
independent half-batch runs — for all three BN sites (DenseBlock,
EdgeConvBlock streaming path, EdgeConvBlock materialised path).
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from pccf.nn.encoders import EdgeConvBlock
from pccf.nn.layers import DenseBlock, GroupedBatchNorm, default_act


def test_grouped_bn_matches_flax_at_g1():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16, 6), dtype=np.float32))
    gbn = GroupedBatchNorm(groups=1)
    fbn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    vg = gbn.init(jax.random.key(1), x, use_running_average=False)
    vf = fbn.init(jax.random.key(1), x, use_running_average=False)
    # same variable tree (checkpoint compatibility)
    assert jax.tree.structure(vg) == jax.tree.structure(vf)
    yg, mg = gbn.apply(vg, x, use_running_average=False, mutable=['batch_stats'])
    yf, mf = fbn.apply(vf, x, use_running_average=False, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(yg), np.asarray(yf), atol=1e-5)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(mg['batch_stats'][k]), np.asarray(mf['batch_stats'][k]), atol=1e-5
        )
    # eval path: running-average normalisation
    ye = gbn.apply(vg, x, use_running_average=True)
    yfe = fbn.apply(vf, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yfe), atol=1e-5)


def test_grouped_bn_equals_independent_half_batches():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 16, 6), dtype=np.float32))
    gbn = GroupedBatchNorm(groups=2)
    v = gbn.init(jax.random.key(2), x, use_running_average=False)
    y, _ = gbn.apply(v, x, use_running_average=False, mutable=['batch_stats'])
    g1 = GroupedBatchNorm(groups=1)
    for half in (slice(0, 4), slice(4, 8)):
        yh, _ = g1.apply(v, x[half], use_running_average=False, mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(y[half]), np.asarray(yh), atol=1e-5)


def test_grouped_bn_rejects_indivisible_batch():
    x = jnp.zeros((6, 4))
    gbn = GroupedBatchNorm(groups=4)
    with pytest.raises(ValueError, match='not divisible'):
        gbn.init(jax.random.key(0), x, use_running_average=False)


@pytest.mark.parametrize('act', [default_act, jnp.tanh], ids=['streaming', 'materialised'])
def test_edgeconv_grouped_equals_half_batches(monkeypatch, act):
    """PCCF_BN_GROUPS=2 on a full batch == two independent G=1 half-batch
    runs, on both EdgeConv BN paths (monotone act -> streaming; tanh ->
    materialised)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 32, 3), dtype=np.float32))
    block = EdgeConvBlock(features=8, k=4, act=act)
    v = block.init(jax.random.key(4), x, None, train=True)

    monkeypatch.setenv('PCCF_BN_GROUPS', '2')
    y, mut = block.apply(v, x, None, train=True, mutable=['batch_stats'])
    monkeypatch.setenv('PCCF_BN_GROUPS', '1')
    halves, stats = [], []
    for half in (slice(0, 2), slice(2, 4)):
        yh, mh = block.apply(v, x[half], None, train=True, mutable=['batch_stats'])
        halves.append(np.asarray(yh))
        stats.append(mh['batch_stats'])
    np.testing.assert_allclose(np.asarray(y), np.concatenate(halves), atol=1e-4)
    # grouped running stats = momentum-blend with the MEAN of the group stats
    for k in ('bn_mean', 'bn_var'):
        blended = 0.9 * np.asarray(v['batch_stats'][k]) + 0.1 * np.mean(
            [np.asarray(
                (s[k] - 0.9 * np.asarray(v['batch_stats'][k])) / 0.1
            ) for s in stats], axis=0,
        )
        np.testing.assert_allclose(
            np.asarray(mut['batch_stats'][k]), blended, atol=1e-4
        )


def test_dense_block_grouped_equals_half_batches(monkeypatch):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 16, 6), dtype=np.float32))
    block = DenseBlock(features=8, act=default_act)
    monkeypatch.setenv('PCCF_BN_GROUPS', '1')
    v = block.init(jax.random.key(6), x, train=True)
    monkeypatch.setenv('PCCF_BN_GROUPS', '2')
    y, _ = block.apply(v, x, train=True, mutable=['batch_stats'])
    monkeypatch.setenv('PCCF_BN_GROUPS', '1')
    for half in (slice(0, 2), slice(2, 4)):
        yh, _ = block.apply(v, x[half], train=True, mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(y[half]), np.asarray(yh), atol=1e-4)
