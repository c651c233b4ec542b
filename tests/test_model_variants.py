"""Tests for model variants: VampPrior, unconditional VQVAE, LDGCNN, Oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pccf.config import get_config_all
from pccf.data.structures import Inputs, Outputs, WInputs, WTargets
from pccf.models import get_autoencoder, get_w_autoencoder
from pccf.models.autoencoders import Oracle

BASE = [
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=6',
    'autoencoder.model.w_dim=32',
    'autoencoder.model.embedding_dim=4',
    'autoencoder.model.book_size=4',
    'autoencoder.model.encoder.n_neighbors=6',
    'autoencoder.model.decoder.map_dims=[8]',
    'autoencoder.model.decoder.conv_dims=[16,8]',
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


def _batch():
    rng = np.random.default_rng(0)
    return Inputs(cloud=jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32)))


class TestVampPrior:
    @pytest.fixture(scope='class')
    def wae_and_vars(self):
        cfg = get_config_all(BASE + ['w_autoencoder.model.n_pseudo_inputs=3'])
        wae = get_w_autoencoder(cfg, conditional=True)
        rng = np.random.default_rng(0)
        w_q = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
        logits = jnp.asarray(rng.standard_normal((4, 2)).astype(np.float32))
        codebook = jnp.asarray(rng.standard_normal((8, 4, 4)).astype(np.float32))
        rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
        variables = wae.init(rngs, WInputs(w_q, logits), codebook, train=False)
        return cfg, wae, variables, w_q, logits, codebook

    def test_forward_produces_pseudo_stats(self, wae_and_vars):
        cfg, wae, variables, w_q, logits, codebook = wae_and_vars
        out = wae.apply(
            variables, WInputs(w_q, logits), codebook, train=True,
            rngs={'sampling': jax.random.key(3), 'dropout': jax.random.key(4)},
        )
        assert out.pseudo_mu1 is not None
        assert out.pseudo_mu1.shape == (3, 8, 4)
        assert out.mu1.shape == (4, 8, 4)  # pseudo rows split off

    def test_vamp_kld_loss(self, wae_and_vars):
        cfg, wae, variables, w_q, logits, codebook = wae_and_vars
        from pccf.train.losses import get_kld_vamp_loss, get_w_autoencoder_loss

        out = wae.apply(
            variables, WInputs(w_q, logits), codebook, train=True,
            rngs={'sampling': jax.random.key(3), 'dropout': jax.random.key(4)},
        )
        out = out.replace(model_epoch=100)
        vamp = get_kld_vamp_loss(cfg)
        vals = vamp.compute_all(out, None)['KLD2_VAMP']
        assert vals.shape == (4,)
        assert np.isfinite(np.asarray(vals)).all()
        # the composite w-loss uses the vamp variant when n_pseudo_inputs > 0
        targets = WTargets(
            w_e=jnp.zeros((4, 32)), one_hot_idx=jax.nn.one_hot(out.idx, 4)
        )
        loss, metrics = get_w_autoencoder_loss(cfg).loss_and_metrics(out, targets)
        assert np.isfinite(float(loss))
        assert 'KLD2_VAMP' in metrics

    def test_generation_samples_pseudo_latents(self, wae_and_vars):
        cfg, wae, variables, w_q, logits, codebook = wae_and_vars
        out = wae.apply(
            variables, codebook, 0.0, 5, None,
            method='generate_discrete_latent_space',
            rngs={'sampling': jax.random.key(9)},
        )
        assert out.idx.shape == (5, 8)
        assert out.probs.shape == (5, 2)
        # Dirichlet condition sums to 1
        np.testing.assert_allclose(np.asarray(out.probs.sum(1)), 1.0, atol=1e-5)


class TestUnconditionalVQVAE:
    def test_plain_vqvae_uniform_probs(self):
        cfg = get_config_all(BASE + ['autoencoder.model.class_name=VQVAE'])
        model = get_autoencoder(cfg)
        assert model.conditional is False
        batch = _batch()
        rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
        variables = model.init(rngs, batch, jnp.zeros((2, 2)), method='full_init')
        out = model.apply(
            variables, batch, rngs={'sampling': jax.random.key(3)}, method='double_reconstruct'
        )
        assert out.recon.shape == (2, 64, 3)
        # unconditional: uniform class probabilities
        np.testing.assert_allclose(np.asarray(out.probs), 0.5, atol=1e-6)


class TestLDGCNN:
    def test_ldgcnn_encoder(self):
        cfg = get_config_all(
            BASE + ['autoencoder.model.encoder.class_name=LDGCNN',
                    'autoencoder.model.encoder.conv_dims=[8,16,16]']
        )
        model = get_autoencoder(cfg)
        batch = _batch()
        rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
        variables = model.init(rngs, batch, train=False)
        out = model.apply(variables, batch, rngs={'sampling': jax.random.key(3)})
        assert out.recon.shape == (2, 64, 3)
        assert np.isfinite(np.asarray(out.recon)).all()


class TestOracle:
    def test_oracle_subset(self):
        oracle = Oracle(n_training_output_points=32, n_inference_output_points=64)
        batch = _batch()
        out = oracle.apply({}, batch, train=True)
        assert out.recon.shape == (2, 32, 3)
        np.testing.assert_array_equal(np.asarray(out.recon), np.asarray(batch.cloud[:, :32]))


class TestLocalCovariance:
    def test_shapes(self):
        from pccf.kernels import ops

        x = _batch().cloud
        idx = ops.knn(x, 4)
        out = ops.get_local_covariance(x, idx)
        assert out.shape == (2, 64, 3 + 9)


class TestLinearWDecoder:
    def test_generate_with_prior_sampled_z1(self):
        """Prior sampling emits z1 of shape (B, 1, z1_dim) when
        n_pseudo_inputs=0; the grouped Linear decoder must broadcast it
        across codes like the transformer decoder (regression: concat
        raised a shape error on the generate path)."""
        base = [ov for ov in BASE if not ov.startswith('w_autoencoder.model.w_decoder.')]
        cfg = get_config_all(
            base
            + [
                'data/dataset=synthetic',
                'data.dataset.n_classes=2',
                'w_autoencoder/model/w_decoder=linear_w_decoder',
                'w_autoencoder.model.w_decoder.mlp_dims=[16,16]',
                'w_autoencoder.model.w_decoder.dropout_rates=[0.,0.]',
            ]
        )
        model = get_autoencoder(cfg)
        rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
        variables = model.init(
            rngs,
            _batch(),
            np.zeros((2, 2), np.float32),
            method='full_init',
        )
        out = model.apply(
            variables, 2, None, 0.0, None, method='generate',
            rngs={'sampling': jax.random.key(3)},
        )
        assert out.recon.shape[0] == 2 and np.isfinite(np.asarray(out.recon)).all()


class TestGroupedInit:
    def test_grouped_kernel_fan_matches_ungrouped(self):
        """The grouped dense kernel (groups, gin, gout) must be initialised
        with per-group fan (torch grouped-conv semantics: fan_in = gin), not
        with variance_scaling over the full shape (fan_in = groups*gin, std a
        factor sqrt(groups) too small — regression)."""
        import jax
        import numpy as np

        from pccf.nn.layers import DenseBlock

        groups, gin, gout = 8, 32, 32
        grouped = DenseBlock(groups * gout, act=lambda x: x, act_name='LeakyReLU', groups=groups,
                             batch_norm=False)
        gv = grouped.init(jax.random.key(0), np.zeros((2, groups * gin), np.float32))
        gk = np.asarray(gv['params']['grouped_kernel'])
        plain = DenseBlock(gout, act=lambda x: x, act_name='LeakyReLU', batch_norm=False)
        pv = plain.init(jax.random.key(0), np.zeros((2, gin), np.float32))
        pk = np.asarray(pv['params']['dense']['kernel'])
        assert gk.std() == pytest.approx(pk.std(), rel=0.15)

    def test_double_reconstruct_conditional_guard(self):
        """double_reconstruct on a conditional model must fail loudly with
        guidance (regression: opaque TypeError from None logits deep inside
        temperature_softmax at trace time)."""
        from pccf.config import get_config_all
        from pccf.models import get_autoencoder
        from pccf.data.structures import Inputs

        cfg = get_config_all(BASE + ['autoencoder.model.class_name=CounterfactualVQVAE'])
        module = get_autoencoder(cfg)
        assert module.conditional
        import jax
        import numpy as np

        cloud = np.zeros((1, 64, 3), np.float32)
        variables = module.init(
            {'params': jax.random.key(0), 'sampling': jax.random.key(1)},
            Inputs(cloud=cloud),
            np.zeros((1, 2), np.float32),
            method='full_init',
        )
        with pytest.raises(ValueError, match='double_reconstruct_with_logits'):
            module.apply(
                variables, Inputs(cloud=cloud), method='double_reconstruct',
                rngs={'sampling': jax.random.key(2)},
            )
