"""Frozen-outer graft used by the stage-2 tuning objective.

The reference shares the trained classifier+VQVAE across trials by filtering
``w_autoencoder`` keys out of the *state dict* (tune_w_autoencoder.py:41) —
which carries the BatchNorm running buffers alongside the weights.  The graft
must therefore transfer batch_stats too: the frozen encoder runs in eval mode
inside every trial, and fresh zero-mean/unit-var stats would corrupt every
trial's latent dataset.
"""

import jax
import numpy as np
import jax.numpy as jnp

from pccf.config import get_config_all
from pccf.data.structures import Inputs
from pccf.models import get_autoencoder
from pccf.train import Model
from tests.test_models import TINY_OVERRIDES

from tune_w_autoencoder import graft_frozen_outer, split_frozen_outer


def _make_model(cfg, seed: int) -> Model:
    model = Model(get_autoencoder(cfg), name='vqvae', seed=seed)
    init_cloud = np.zeros((1, cfg.data.n_input_points, 3), np.float32)
    model.initialize(
        Inputs(cloud=init_cloud),
        np.zeros((1, cfg.data.dataset.n_classes), np.float32),
        method='full_init',
    )
    return model


def test_graft_transfers_outer_params_and_batch_stats():
    cfg = get_config_all(TINY_OVERRIDES)
    trained = _make_model(cfg, seed=0)

    # emulate training: shift every outer param and BN running stat away from
    # its init value
    trained.params = jax.tree.map(lambda p: p + 1.0, trained.params)
    assert trained.batch_stats, 'VQVAE encoder should carry BN running stats'
    trained.variables = {
        **trained.variables,
        'batch_stats': jax.tree.map(lambda s: s + 3.5, trained.batch_stats),
    }

    frozen_outer, frozen_stats = split_frozen_outer(trained)
    assert 'w_autoencoder' not in frozen_outer
    assert frozen_stats, 'outer BN running stats must be part of the graft'

    fresh = _make_model(cfg, seed=7)
    fresh_inner = jax.tree.map(lambda p: p, fresh.params['w_autoencoder'])
    graft_frozen_outer(fresh, frozen_outer, frozen_stats)

    # outer weights and BN stats now match the trained model exactly
    for key, sub in frozen_outer.items():
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            sub,
            fresh.params[key],
        )
    for key, sub in frozen_stats.items():
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            sub,
            fresh.batch_stats[key],
        )
    # the trial's inner CVAE is untouched (fresh init, not the trained one)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        fresh_inner,
        fresh.params['w_autoencoder'],
    )
    # and eval-mode encoding actually uses the grafted stats: outputs of the
    # trained and grafted models agree on the same input
    rng = np.random.default_rng(0)
    batch = Inputs(cloud=jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32))
    out_a = trained.module.apply(
        trained.variables, batch, train=False, rngs={'sampling': jax.random.key(3)}
    )
    out_b = fresh.module.apply(
        {**fresh.variables, 'params': {**fresh.params, 'w_autoencoder': trained.params['w_autoencoder']}},
        batch,
        train=False,
        rngs={'sampling': jax.random.key(3)},
    )
    np.testing.assert_allclose(np.asarray(out_a.w_q), np.asarray(out_b.w_q), rtol=1e-6)
