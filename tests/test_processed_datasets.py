"""Derived-dataset machinery tests (model-in-the-loop data synthesis)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pccf.config import get_config_all
from pccf.data import Inputs, get_datasets
from pccf.data.processed import (
    BoundaryDataset,
    CounterfactualDatasetEncoder,
    DoubleReconstructedDatasetWithLogits,
    WDatasetEncoder,
    WDatasetWithLogits,
    WDatasetWithLogitsFrozen,
)
from pccf.data.protocols import Singleton
from pccf.models import get_autoencoder
from pccf.nn import get_classifier
from pccf.train import Model

TINY = [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=8',
    'data.dataset.settings.n_test=4',
    'data.dataset.settings.base_points=96',
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=6',
    'classifier.model.n_neighbors=6',
    'classifier.model.conv_dims=[8,8]',
    'classifier.model.mlp_dims=[16,8]',
    'classifier.model.feature_dim=16',
    'autoencoder.model.w_dim=16',
    'autoencoder.model.embedding_dim=4',
    'autoencoder.model.book_size=4',
    'autoencoder.model.encoder.n_neighbors=6',
    'autoencoder.model.decoder.map_dims=[8]',
    'autoencoder.model.decoder.conv_dims=[8]',
    'autoencoder.model.decoder.n_components=2',
    'autoencoder.model.decoder.sample_dim=4',
    'w_autoencoder.model.w_encoder.proj_dim=8',
    'w_autoencoder.model.w_encoder.n_heads=2',
    'w_autoencoder.model.w_encoder.mlp_dims=[8]',
    'w_autoencoder.model.w_decoder.proj_dim=8',
    'w_autoencoder.model.w_decoder.n_heads=2',
    'w_autoencoder.model.w_decoder.mlp_dims=[8]',
    'w_autoencoder.model.conditional_w_encoder.proj_dim=8',
    'w_autoencoder.model.conditional_w_encoder.n_heads=2',
    'w_autoencoder.model.conditional_w_encoder.mlp_dims=[8]',
    'w_autoencoder.model.z1_dim=4',
    'w_autoencoder.model.z2_dim=4',
    'user.seed=0',
]


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    import os

    tmp = tmp_path_factory.mktemp('proc')
    os.environ['ROOT_EXP_DIR'] = str(tmp / 'e')
    os.environ['DATASET_DIR'] = str(tmp / 'd')
    Singleton.reset_all()
    cfg = get_config_all(TINY)
    train_ds, _ = get_datasets(cfg)
    vq_module = get_autoencoder(cfg)
    vqvae = Model(vq_module, 'VQVAE', seed=0)
    init_cloud = np.zeros((1, 64, 3), np.float32)
    vqvae.initialize(Inputs(cloud=init_cloud), np.zeros((1, 2), np.float32), method='full_init')
    cls_module = get_classifier(cfg)
    classifier = Model(cls_module, 'DGCNN', seed=0)
    classifier.initialize(Inputs(cloud=init_cloud), train=False)
    return cfg, train_ds, vqvae, classifier


class TestDerivedDatasets:
    def test_w_dataset_encoder(self, setup):
        cfg, ds, vqvae, _ = setup
        derived = WDatasetEncoder(ds, vqvae)
        items = derived.__getitems__([0, 1, 2])
        w_in, w_t = items[0]
        assert w_in.w_q.shape == (16,)
        assert w_t.w_e.shape == (16,)
        assert w_t.one_hot_idx.shape == (4, 4)
        np.testing.assert_allclose(w_t.one_hot_idx.sum(-1), 1.0)

    def test_with_logits_and_frozen(self, setup):
        cfg, ds, vqvae, classifier = setup
        derived = WDatasetWithLogits(ds, vqvae, classifier)
        items = derived.__getitems__([0, 1])
        assert items[0][0].logits.shape == (2,)
        frozen = WDatasetWithLogitsFrozen(ds, vqvae, classifier)
        a = frozen.__getitems__([3])[0]
        b = frozen.__getitems__([3])[0]
        np.testing.assert_array_equal(a[0].w_q, b[0].w_q)  # precomputed once

    def test_double_reconstructed(self, setup):
        cfg, ds, vqvae, classifier = setup
        derived = DoubleReconstructedDatasetWithLogits(ds, vqvae, classifier)
        items = derived.__getitems__([0, 1])
        inp, tgt = items[0]
        assert inp.cloud.shape == (64, 3)
        np.testing.assert_array_equal(inp.cloud, tgt.ref_cloud)

    def test_stochastic_datasets_redraw_noise_per_call(self, setup):
        """Non-Frozen derived datasets must redraw CVAE sampling noise on
        every pass (reference processed.py:79-87 consumes torch's global
        RNG) — not repeat one fixed key like the *Frozen* variants
        (regression: a constant jax.random.key(0) froze every epoch's
        latent noise)."""
        cfg, ds, vqvae, classifier = setup
        derived = DoubleReconstructedDatasetWithLogits(ds, vqvae, classifier)
        a = derived.__getitems__([0])[0][0].cloud
        b = derived.__getitems__([0])[0][0].cloud
        assert np.abs(a - b).max() > 1e-6

    def test_counterfactual_and_boundary(self, setup):
        cfg, ds, vqvae, classifier = setup
        cf = CounterfactualDatasetEncoder(ds, vqvae, classifier, target_dim=1, target_value=1.0)
        items = cf.__getitems__([0, 1])
        assert int(items[0][1].label) == 1  # labelled with the target class
        boundary = BoundaryDataset(ds, vqvae, classifier)
        assert boundary.target_value == 0.0
        items = boundary.__getitems__([0])
        assert items[0][0].cloud.shape == (64, 3)

    def test_per_item_access_and_take_from_dataset(self, setup):
        """Derived datasets must support dataset[i] (the PointCloudDataset
        protocol and take_from_dataset both need it — regression: only
        __getitems__ existed, so take_from_dataset raised TypeError)."""
        from pccf.train.loader import take_from_dataset

        cfg, ds, vqvae, _ = setup
        derived = WDatasetEncoder(ds, vqvae)
        w_in, w_t = derived[1]
        assert w_in.w_q.shape == (16,)
        batch_in, batch_t = take_from_dataset(derived, 2)
        assert batch_in.w_q.shape == (2, 16)
        assert batch_t.w_e.shape == (2, 16)
