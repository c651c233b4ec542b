"""Frozen-submodule optimizer exclusion (reference src/module/autoencoders.py:96-98).

The reference marks every parameter of the embedded w_autoencoder
``requires_grad=False`` at VQVAE construction, so torch's AdamW never visits
the subtree — in particular its *decoupled weight decay* never shrinks it.
The pccf Trainer replicates this with an ``optax.multi_transform`` mask; these
tests assert the inner CVAE stays bit-identical through stage-1 training with
weight_decay > 0 (the EMD fine-tune flow resumes a merged checkpoint and
continues stage-1 training, so decay there would silently destroy the trained
inner CVAE).
"""

import jax
import numpy as np
import pytest

from pccf.config import Experiment, get_config_all
from pccf.data import Inputs, get_datasets
from pccf.data.protocols import Singleton
from pccf.models import get_autoencoder
from pccf.train import DataLoader, Model, Trainer, get_autoencoder_loss, get_learning_schema

TINY = [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=8',
    'data.dataset.settings.n_test=4',
    'data.dataset.settings.base_points=96',
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
    'autoencoder.objective.recon_loss=Chamfer',
    'autoencoder.train.batch_size=4',
    'autoencoder.train.n_epochs=2',
    # decisive decay: unmasked AdamW would shrink frozen params by
    # (1 - lr*wd) per step, detectable after a couple of steps
    'autoencoder.train.learn.opt_settings.weight_decay=0.5',
    'autoencoder.train.learn.learning_rate=0.1',
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
    'user.seed=0',
    'user.trackers.tensorboard=false',
    'user.checkpoint_every=0',
]


@pytest.fixture()
def cfg(tmp_path, monkeypatch):
    monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'exp'))
    monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
    Singleton.reset_all()
    return get_config_all(TINY)


def _setup_trainer(cfg, frozen):
    ae = get_autoencoder(cfg)
    model = Model(ae, name=cfg.autoencoder.model.name, seed=0)
    train_ds, _ = get_datasets(cfg)
    loader = DataLoader(train_ds, cfg.autoencoder.train.batch_size)
    sample_inputs, _ = train_ds[0]
    init_inputs = Inputs(cloud=np.stack([sample_inputs.cloud]))
    init_logits = np.zeros((1, cfg.data.dataset.n_classes), np.float32)
    model.initialize(init_inputs, init_logits, method='full_init')
    schema = get_learning_schema(cfg.autoencoder)
    loss = get_autoencoder_loss(cfg)
    return model, Trainer(model, loader, loss, schema, frozen=frozen)


def _wae_leaves(params):
    return [np.asarray(x) for x in jax.tree.leaves(jax.device_get(params['w_autoencoder']))]


def test_frozen_subtree_bit_identical_after_training(cfg, tmp_path):
    exp = Experiment(cfg, name='frozen-test', par_dir=tmp_path)
    with exp.create_run():
        model, trainer = _setup_trainer(cfg, frozen=('w_autoencoder',))
        before = _wae_leaves(model.params)
        enc_before = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(model.params['encoder']))]
        trainer.train_until(2)
        after = _wae_leaves(trainer.state.params)
        for a, b in zip(before, after, strict=True):
            np.testing.assert_array_equal(a, b)
        # the trained part must actually have moved
        enc_after = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(trainer.state.params['encoder']))]
        assert any(not np.array_equal(a, b) for a, b in zip(enc_before, enc_after, strict=True))


def test_unmasked_decay_would_shrink_frozen_subtree(cfg, tmp_path):
    """Control: without the mask, decoupled weight decay decays the zero-grad
    subtree — proving the masked test above is actually testing something."""
    exp = Experiment(cfg, name='frozen-control', par_dir=tmp_path)
    with exp.create_run():
        model, trainer = _setup_trainer(cfg, frozen=())
        before = _wae_leaves(model.params)
        trainer.train_until(1)
        after = _wae_leaves(trainer.state.params)
        changed = any(
            not np.array_equal(a, b) for a, b in zip(before, after, strict=True)
        )
        assert changed, 'control failed: unmasked AdamW left the subtree untouched'
