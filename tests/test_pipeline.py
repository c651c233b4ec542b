"""Full-pipeline integration test on synthetic data (tiny shapes, CPU mesh).

Mirrors run.sh: train_classifier -> train_autoencoder -> train_w_autoencoder
-> evaluate_counterfactuals, plus generation — end to end through
checkpoints and the derived-dataset machinery.
"""

import numpy as np
import pytest

from pccf.config import Experiment, get_config_all
from pccf.data.protocols import Singleton

TINY = [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=12',
    'data.dataset.settings.n_test=6',
    'data.dataset.settings.base_points=96',
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=6',
    'classifier.model.n_neighbors=6',
    'classifier.model.conv_dims=[8,8]',
    'classifier.model.mlp_dims=[16,16]',
    'classifier.model.feature_dim=16',
    'classifier.train.batch_size=4',
    'classifier.train.n_epochs=1',
    'classifier.train.early_stopping.active=false',
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
    'autoencoder.diagnose_every=2',
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
    'w_autoencoder.train.batch_size=4',
    'w_autoencoder.train.n_epochs=1',
    'user.seed=0',
    'user.trackers.tensorboard=false',
    'user.checkpoint_every=0',
    'user.generate.batch_size=2',
    'user.plot.sample_indices=[0,1]',
]


@pytest.fixture(scope='module')
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('pipeline')
    import os

    os.environ['ROOT_EXP_DIR'] = str(tmp / 'exp')
    os.environ['DATASET_DIR'] = str(tmp / 'data')
    Singleton.reset_all()
    return get_config_all(TINY)


@pytest.fixture(scope='module')
def experiment(cfg):
    from pccf.train import get_trackers

    exp = Experiment(cfg, name='pipeline-test')
    for tracker in get_trackers(cfg):
        exp.subscribe(tracker)
    return exp


def test_full_pipeline(cfg, experiment):
    from train_classifier import train_classifier
    from train_autoencoder import train_autoencoder
    from train_w_autoencoder import load_models, train_w_autoencoder
    from evaluate_counterfactuals import evaluate_counterfactuals
    from generate import generate_random_samples

    with experiment.create_run():
        # stage 0: classifier
        train_classifier()
        # stage 1: VQ-VAE autoencoder
        chamfer = train_autoencoder()
        assert chamfer is not None and np.isfinite(chamfer)
        # stage 2: inner CVAE
        classifier, vqvae = load_models(cfg)
        loss = train_w_autoencoder(cfg, vqvae, classifier)
        assert loss is not None and np.isfinite(loss)
        vqvae.save_state()
        # evaluation suites
        metrics = evaluate_counterfactuals(cfg, classifier, vqvae)
        assert 'Accuracy' in metrics
        # unconditional generation
        clouds = generate_random_samples(cfg)
        assert clouds.shape == (2, 64, 3)
        assert np.isfinite(clouds).all()
        # deployment artifact: export the trained checkpoints, reload with
        # no model code, and check the exported classifier agrees
        from export_artifact import export_from_config
        from pccf.export import load_artifact

        manifest = export_from_config(cfg)
        art_dir = cfg.user.path.version_dir / 'artifacts' / cfg.name
        art = load_artifact(art_dir)
        test_clouds = np.asarray(clouds[:2], np.float32)
        logits = art.classify(test_clouds)
        assert logits.shape == (2, cfg.data.dataset.n_classes)
        recon = art.counterfactual(test_clouds, 0, logits)
        assert recon.shape == (2, manifest['n_out'], 3)
        assert np.isfinite(recon).all()


def test_emd_finetune_resumes_merged_checkpoint(cfg):
    """BASELINE config 4: resume the stage-2 merged checkpoint and continue
    stage-1-style training with the ChamferEMD composite.

    The fine-tune must (a) train the outer autoencoder, (b) leave the trained
    inner CVAE bit-identical (frozen mask keeps AdamW decay off it), and
    (c) produce a finite Chamfer on the final test."""
    import jax

    from train_autoencoder import train_autoencoder
    from pccf.data import Inputs
    from pccf.models import get_autoencoder
    from pccf.train import Model

    ft_overrides = [
        'autoencoder.objective.recon_loss=ChamferEMD',
        'autoencoder.train.n_epochs=8',
        'user.load_checkpoint=-1',
        # decisive decay: an unmasked optimizer would visibly shrink the
        # frozen inner CVAE within a couple of epochs
        'autoencoder.train.learn.opt_settings.weight_decay=0.5',
    ]
    Singleton.reset_all()
    cfg_ft = get_config_all(TINY + ft_overrides)

    def snapshot():
        model = Model(get_autoencoder(cfg_ft), name=cfg_ft.autoencoder.model.name, seed=0)
        model.initialize(
            Inputs(cloud=np.zeros((1, cfg_ft.data.n_input_points, 3), np.float32)),
            np.zeros((1, cfg_ft.data.dataset.n_classes), np.float32),
            method='full_init',
        )
        model.load_state(-1)
        return jax.device_get(model.params), model.epoch

    exp = Experiment(cfg_ft, name='pipeline-test')
    with exp.create_run(resume=True):
        before, epoch_before = snapshot()
        chamfer = train_autoencoder()
        assert chamfer is not None and np.isfinite(chamfer)
        after, epoch_after = snapshot()

    assert epoch_after > epoch_before, 'fine-tune did not advance training'
    for a, b in zip(
        jax.tree.leaves(before['w_autoencoder']),
        jax.tree.leaves(after['w_autoencoder']),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    enc_changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(before['encoder']), jax.tree.leaves(after['encoder']), strict=True
        )
    )
    assert enc_changed, 'fine-tune left the outer autoencoder untouched'


def test_stage2_trains_batchnorm_inner_networks(tmp_path, monkeypatch):
    """The shipped Convolutional/Linear inner-network options carry BatchNorm
    (DenseBlock batch_norm=True): stage-2 must keep their batch_stats
    collection through build_w_train_model and merge the trained statistics
    back (regression: the rebuilt variables dict dropped batch_stats, so the
    first Trainer step raised ScopeCollectionNotFound)."""
    import jax

    from pccf.data import Inputs
    from pccf.models import get_autoencoder
    from pccf.nn import get_classifier
    from pccf.train import Model
    from train_w_autoencoder import train_w_autoencoder

    monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'exp'))
    monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
    Singleton.reset_all()
    bn_tiny = [
        ov
        for ov in TINY
        if not ov.startswith(
            ('w_autoencoder.model.w_encoder.', 'w_autoencoder.model.w_decoder.')
        )
    ] + [
        'w_autoencoder/model/w_encoder=convolutional_w_encoder',
        'w_autoencoder.model.w_encoder.conv_dims=[8,16]',
        'w_autoencoder.model.w_encoder.dropout_rates=[0.,0.]',
        'w_autoencoder/model/w_decoder=linear_w_decoder',
        'w_autoencoder.model.w_decoder.mlp_dims=[16,16]',
        'w_autoencoder.model.w_decoder.dropout_rates=[0.,0.]',
    ]
    cfg = get_config_all(bn_tiny)
    exp = Experiment(cfg, name='bn-stage2')
    with exp.create_run(record=False):
        classifier = Model(get_classifier(cfg), name='cls_bn', seed=0)
        classifier.initialize(Inputs(cloud=np.zeros((1, 64, 3), np.float32)), train=False)
        vqvae = Model(get_autoencoder(cfg), name='vq_bn', seed=0)
        vqvae.initialize(
            Inputs(cloud=np.zeros((1, 64, 3), np.float32)),
            np.zeros((1, 2), np.float32),
            method='full_init',
        )
        before = vqvae.variables['batch_stats']['w_autoencoder']
        loss = train_w_autoencoder(cfg, vqvae, classifier)
        assert loss is not None and np.isfinite(loss)
        after = vqvae.variables['batch_stats']['w_autoencoder']
        # trained BN statistics were merged back into the full model
        deltas = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(after), jax.tree.leaves(before))
        ]
        assert max(deltas) > 0.0
