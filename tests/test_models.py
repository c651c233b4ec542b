"""Model wiring tests on tiny shapes (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pccf.config import get_config_all
from pccf.data.structures import Inputs, WInputs
from pccf.models import get_autoencoder, get_w_autoencoder
from pccf.nn import get_classifier

TINY_OVERRIDES = [
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=8',
    'classifier.model.n_neighbors=8',
    'classifier.model.conv_dims=[8,16]',
    'classifier.model.mlp_dims=[32,16]',
    'classifier.model.feature_dim=32',
    'autoencoder.model.w_dim=32',
    'autoencoder.model.embedding_dim=4',
    'autoencoder.model.book_size=4',
    'autoencoder.model.decoder.map_dims=[8]',
    'autoencoder.model.decoder.conv_dims=[32,16]',
    'autoencoder.model.decoder.n_components=2',
    'autoencoder.model.decoder.sample_dim=4',
    'w_autoencoder.model.w_encoder.proj_dim=16',
    'w_autoencoder.model.w_encoder.n_heads=2',
    'w_autoencoder.model.w_encoder.mlp_dims=[16]',
    'w_autoencoder.model.w_decoder.proj_dim=16',
    'w_autoencoder.model.w_decoder.n_heads=2',
    'w_autoencoder.model.w_decoder.mlp_dims=[16]',
    'w_autoencoder.model.conditional_w_encoder.proj_dim=16',
    'w_autoencoder.model.conditional_w_encoder.n_heads=2',
    'w_autoencoder.model.conditional_w_encoder.mlp_dims=[16]',
    'w_autoencoder.model.z1_dim=4',
    'w_autoencoder.model.z2_dim=4',
]


@pytest.fixture(scope='module')
def cfg():
    return get_config_all(TINY_OVERRIDES)


@pytest.fixture(scope='module')
def batch():
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    return Inputs(cloud=cloud)


class TestClassifier:
    def test_forward_shapes(self, cfg, batch):
        model = get_classifier(cfg)
        rngs = {'params': jax.random.key(0), 'dropout': jax.random.key(1)}
        variables = model.init(rngs, batch, train=False)
        logits = model.apply(variables, batch, train=False)
        assert logits.shape == (2, cfg.data.dataset.n_classes)
        assert np.isfinite(np.asarray(logits)).all()

    def test_train_mode_with_bn_updates(self, cfg, batch):
        model = get_classifier(cfg)
        rngs = {'params': jax.random.key(0), 'dropout': jax.random.key(1)}
        variables = model.init(rngs, batch, train=True)
        logits, updates = model.apply(
            variables, batch, train=True, rngs={'dropout': jax.random.key(2)}, mutable=['batch_stats']
        )
        assert logits.shape == (2, cfg.data.dataset.n_classes)
        assert 'batch_stats' in updates


class TestVQVAE:
    @pytest.fixture(scope='class')
    def model_and_vars(self, cfg, batch):
        model = get_autoencoder(cfg)
        rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
        logits = jnp.zeros((2, cfg.data.dataset.n_classes), jnp.float32)
        variables = model.init(rngs, batch, logits, method='full_init')
        return model, variables

    def test_forward(self, cfg, batch, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, batch, train=False, rngs={'sampling': jax.random.key(3)})
        assert out.recon.shape == (2, 64, 3)
        assert out.w_q.shape == (2, 32)
        assert out.idx.shape == (2, 8)  # 32 / 4 codes
        assert out.one_hot_idx.shape == (2, 8, 4)
        assert np.isfinite(np.asarray(out.recon)).all()

    def test_train_forward_and_grad(self, cfg, batch, model_and_vars):
        model, variables = model_and_vars
        params = variables['params']
        other = {k: v for k, v in variables.items() if k != 'params'}

        def loss_fn(p):
            out, _ = model.apply(
                {'params': p, **other},
                batch,
                train=True,
                rngs={'sampling': jax.random.key(3), 'dropout': jax.random.key(4)},
                mutable=['batch_stats'],
            )
            from pccf.kernels import ops

            chamf = ops.chamfer(out.recon, batch.cloud).mean()
            embed = jnp.mean((out.w_q - out.w_e) ** 2)
            return chamf + embed

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        # straight-through: encoder must receive gradient through the quantizer
        enc_grads = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()), grads['encoder'], 0.0)
        assert enc_grads > 0
        # frozen-by-training-loop: w_autoencoder params exist but get no recon grads
        assert 'w_autoencoder' in grads
        w_grads = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()), grads['w_autoencoder'], 0.0)
        assert w_grads == 0.0

    def test_double_reconstruct_with_logits(self, cfg, batch, model_and_vars):
        model, variables = model_and_vars
        logits = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2)).astype(np.float32))
        out = model.apply(
            variables,
            batch,
            logits,
            rngs={'sampling': jax.random.key(5)},
            method='double_reconstruct_with_logits',
        )
        assert out.recon.shape == (2, 64, 3)
        assert out.w_recon is not None

    def test_generate_counterfactual(self, cfg, batch, model_and_vars):
        model, variables = model_and_vars
        logits = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2)).astype(np.float32))
        out = model.apply(
            variables,
            batch,
            logits,
            1,
            1.0,
            rngs={'sampling': jax.random.key(5)},
            method='generate_counterfactual',
        )
        assert out.recon.shape == (2, 64, 3)
        assert np.isfinite(np.asarray(out.recon)).all()
        # counterfactual probs must be one-hot at target for value=1
        np.testing.assert_allclose(np.asarray(out.probs[:, 1]), 1.0, atol=1e-6)

    def test_generate(self, cfg, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(
            variables, 3, rngs={'sampling': jax.random.key(6)}, method='generate'
        )
        assert out.recon.shape == (3, 64, 3)

    def test_deterministic_counterfactual(self, cfg, batch, model_and_vars):
        # value=0 counterfactual equals conditional double-reconstruction with means
        model, variables = model_and_vars
        logits = jnp.zeros((2, 2), jnp.float32)
        out1 = model.apply(
            variables, batch, logits, 0, 0.0, rngs={'sampling': jax.random.key(1)},
            method='generate_counterfactual',
        )
        out2 = model.apply(
            variables, batch, logits, 1, 0.0, rngs={'sampling': jax.random.key(2)},
            method='generate_counterfactual',
        )
        # target_value=0 -> same probs regardless of target_dim; deterministic path
        np.testing.assert_allclose(np.asarray(out1.idx), np.asarray(out2.idx))


class TestWAutoEncoder:
    def test_forward(self, cfg):
        wae = get_w_autoencoder(cfg, conditional=True)
        rng = np.random.default_rng(0)
        w_q = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
        logits = jnp.asarray(rng.standard_normal((4, 2)).astype(np.float32))
        codebook = jnp.asarray(rng.standard_normal((8, 4, 4)).astype(np.float32))
        rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
        variables = wae.init(rngs, WInputs(w_q, logits), codebook, train=False)
        out = wae.apply(
            variables, WInputs(w_q, logits), codebook, train=True,
            rngs={'sampling': jax.random.key(3), 'dropout': jax.random.key(4)},
        )
        assert out.w_recon.shape == (4, 32)
        assert out.mu1.shape == (4, 8, 4)
        assert out.p_mu2.shape == (4, 8, 4)
        assert out.idx.shape == (4, 8)
        assert out.w_dist_2.shape == (4, 8, 4)
        # tempered softmax of logits
        np.testing.assert_allclose(
            np.asarray(out.probs), np.asarray(jax.nn.softmax(logits / 5.0, axis=1)), atol=1e-5
        )
