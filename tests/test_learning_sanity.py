"""Learning sanity: the classifier separates synthetic shape classes.

Evidence that the whole training loop (loss, grads, optimizer, schedule, BN)
actually learns — not just runs.
"""

import numpy as np
import pytest

from pccf.config import Experiment, get_config_all
from pccf.data import get_datasets
from pccf.data.protocols import Singleton
from pccf.nn import get_classifier
from pccf.train import DataLoader, Model, Test, Trainer, get_classification_loss, get_learning_schema

OVERRIDES = [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=32',
    'data.dataset.settings.n_test=16',
    'data.dataset.settings.base_points=256',
    'data.n_input_points=128',
    'data.n_target_points=128',
    'data.n_neighbors=8',
    'data.jitter_sigma=0.005',
    'classifier.model.n_neighbors=8',
    'classifier.model.conv_dims=[16,32]',
    'classifier.model.mlp_dims=[32,16]',
    'classifier.model.feature_dim=32',
    'classifier.model.dropout_rates=[0.0,0.0]',
    'classifier.train.batch_size=8',
    'classifier.train.n_epochs=8',
    'classifier.train.learn.learning_rate=0.02',
    'classifier.train.early_stopping.active=false',
    'user.seed=0',
    'user.trackers.tensorboard=false',
    'user.trackers.csv=false',
    'user.checkpoint_every=0',
]


@pytest.mark.slow
def test_classifier_learns_shapes(tmp_path, monkeypatch):
    monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'exp'))
    monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
    Singleton.reset_all()
    cfg = get_config_all(OVERRIDES)
    exp = Experiment(cfg, name='sanity')
    with exp.create_run():
        module = get_classifier(cfg)
        model = Model(module, name='DGCNN', seed=0)
        train_ds, val_ds = get_datasets(cfg)
        sample = train_ds[0]
        model.initialize(type(sample[0])(cloud=np.stack([sample[0].cloud])), train=False)
        loss = get_classification_loss()
        trainer = Trainer(model, DataLoader(train_ds, 8), loss, get_learning_schema(cfg.classifier))
        trainer.train_until(cfg.classifier.train.n_epochs)
        # training CE must drop substantially
        first, last = trainer.metrics_log[0]['CrossEntropy'], trainer.metrics_log[-1]['CrossEntropy']
        assert last < first * 0.7, (first, last)
        # and held-out accuracy must beat chance clearly (sphere vs box)
        results = Test(model, DataLoader(val_ds, 8), metric=loss)()
        assert results['Accuracy'] >= 0.75, results
