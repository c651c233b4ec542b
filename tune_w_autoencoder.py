"""Tune the W-autoencoder hyper-parameters (native study engine).

pccf counterpart of the reference entry point (tune_w_autoencoder.py): the
frozen outer weights (classifier + VQVAE minus the inner CVAE) are loaded
once and shared across trials; each trial builds a new inner CVAE from its
suggested architecture overrides.
"""

from __future__ import annotations

import pathlib
import sys
from typing import Callable

from pccf.config import Experiment, compose, get_config_all
from pccf.config.environment import VERSION
from pccf.train import ConvergenceError
from pccf.utils import tuning
from pccf.utils.tuning import Trial, TrialPruned, impute_failed_trial, impute_pruned_trial

from train_w_autoencoder import load_models, train_w_autoencoder

TUNING_DIR = pathlib.Path(__file__).resolve().parent / 'configs' / 'tuning' / 'w_autoencoder'


def set_objective(tune_cfg: dict) -> Callable[[Trial], float]:
    main_cfg = get_config_all()
    main_exp = Experiment(main_cfg, name=main_cfg.name, par_dir=main_cfg.user.path.version_dir)
    with main_exp.create_run(resume=True, record=False):
        classifier, vqvae = load_models(main_cfg)
    # share the frozen outer weights across trials (reference filters
    # w_autoencoder keys out of the state dict, tune_w_autoencoder.py:41)
    frozen_outer = {k: v for k, v in vqvae.params.items() if k != 'w_autoencoder'}

    def objective(trial: Trial) -> float:
        overrides = tuning.suggest_overrides(tune_cfg, trial)
        cfg = get_config_all(overrides)
        exp = Experiment(cfg, name='Trial', par_dir=cfg.user.path.version_dir, tags=overrides)
        with exp.create_run(record=False):
            from pccf.models import get_autoencoder
            from pccf.train import Model

            import numpy as np

            new_module = get_autoencoder(cfg)
            new_vqvae = Model(new_module, name=cfg.autoencoder.model.name, seed=cfg.user.seed or 0)
            init_cloud = np.zeros((1, cfg.data.n_input_points, 3), np.float32)
            from pccf.data import Inputs

            new_vqvae.initialize(
                Inputs(cloud=init_cloud),
                np.zeros((1, cfg.data.dataset.n_classes), np.float32),
                method='full_init',
            )
            # graft frozen outer weights; keep the trial's fresh inner CVAE
            params = dict(new_vqvae.params)
            params.update(frozen_outer)
            new_vqvae.params = params
            try:
                value = train_w_autoencoder(cfg, new_vqvae, classifier, trial=trial)
            except TrialPruned:
                return impute_pruned_trial(trial)
            except ConvergenceError:
                return impute_failed_trial(trial)
        del value
        return tuning.get_final_value(trial)

    return objective


def main(argv: list[str] | None = None) -> tuning.Study:
    argv = sys.argv[1:] if argv is None else argv
    tune_cfg = compose(TUNING_DIR, 'defaults', overrides=argv)
    pathlib.Path(tune_cfg['db_location']).mkdir(parents=True, exist_ok=True)
    t = tune_cfg['tune']
    pruner = tuning.MedianPruner(
        n_startup_trials=t['n_startup_trials'],
        n_warmup_steps=t['n_warmup_steps'],
        interval_steps=t['interval_steps'],
        n_min_trials=t['n_min_trials'],
    )
    study_name = tuning.get_study_name(
        f'v{VERSION}', 'main', t['study_name'], tune_cfg.get('overrides', [])
    )
    study = tuning.create_study(
        study_name=study_name, storage=tune_cfg['storage'], pruner=pruner,
        sampler=tuning.make_sampler(t.get('sampler', 'gp'), n_startup=t['n_startup_trials']),
    )
    study.optimize(set_objective(tune_cfg), n_trials=t['n_trials'])
    tuning.visualize_study(study, pathlib.Path(tune_cfg['db_location']) / study_name)
    return study


if __name__ == '__main__':
    main()
