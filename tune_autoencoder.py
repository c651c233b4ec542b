"""Tune the autoencoder hyper-parameters (native study engine).

pccf counterpart of the reference entry point (tune_autoencoder.py):
study over the tuning YAML tree with median pruning and pruned/failed-trial
imputation.
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

from train_autoencoder import train_autoencoder

TUNING_DIR = pathlib.Path(__file__).resolve().parent / 'configs' / 'tuning' / 'autoencoder'


def set_objective(tune_cfg: dict) -> Callable[[Trial], float]:
    def objective(trial: Trial) -> float:
        overrides = tuning.suggest_overrides(tune_cfg, trial)
        cfg = get_config_all(overrides)
        exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
        with exp.create_run(record=False):
            try:
                train_autoencoder(trial=trial)
            except TrialPruned:
                return impute_pruned_trial(trial)
            except ConvergenceError:
                return impute_failed_trial(trial)
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
