"""Tuning integration: real (tiny) autoencoder training driven by the study
engine, with suggested overrides, pruning callback, and final values."""

import numpy as np
import pytest

from pccf.config import Experiment, get_config_all
from pccf.data.protocols import Singleton
from pccf.utils import tuning

TINY = [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=8',
    'data.dataset.settings.n_test=4',
    'data.dataset.settings.base_points=96',
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=6',
    'autoencoder.model.w_dim=16',
    'autoencoder.model.embedding_dim=4',
    'autoencoder.model.book_size=4',
    'autoencoder.model.encoder.n_neighbors=6',
    'autoencoder.model.decoder.map_dims=[8]',
    'autoencoder.model.decoder.conv_dims=[8]',
    'autoencoder.model.decoder.n_components=2',
    'autoencoder.model.decoder.sample_dim=4',
    'autoencoder.model.decoder.filter=false',
    'autoencoder.objective.recon_loss=Chamfer',
    'autoencoder.train.batch_size=4',
    'autoencoder.train.n_epochs=2',
    'autoencoder.diagnose_every=5',
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
    'user.trackers.tensorboard=false',
    'user.trackers.csv=false',
    'user.checkpoint_every=0',
]


@pytest.mark.slow
def test_tune_autoencoder_objective(tmp_path, monkeypatch):
    monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'exp'))
    monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
    Singleton.reset_all()

    from train_autoencoder import train_autoencoder

    tune_cfg = {
        'overrides': TINY,
        'tune': {
            'params': {
                'autoencoder.train.learn.learning_rate': {
                    'suggest': 'suggest_float',
                    'settings': {'low': 1e-3, 'high': 1e-2},
                },
            }
        },
    }
    study = tuning.create_study('e2e', f'sqlite:///{tmp_path}/s.db')

    def objective(trial: tuning.Trial) -> float:
        overrides = tuning.suggest_overrides(tune_cfg, trial)
        cfg = get_config_all(overrides)
        exp = Experiment(cfg, name=f'trial{trial.number}')
        with exp.create_run(record=False):
            try:
                train_autoencoder(trial=trial)
            except tuning.TrialPruned:
                return tuning.impute_pruned_trial(trial)
        return tuning.get_final_value(trial)

    study.optimize(objective, n_trials=2)
    trials = study.get_trials()
    assert len(trials) == 2
    completed = [t for t in trials if t.state == tuning.TrialState.COMPLETE]
    assert completed, [t.state for t in trials]
    for t in completed:
        assert t.value is not None and np.isfinite(t.value)
        assert 'autoencoder.train.learn.learning_rate' in t.params
        assert t.intermediate_values  # TrialCallback reported per epoch
