"""Tune the autoencoder hyper-parameters (native study engine).

pccf counterpart of the reference entry point (tune_autoencoder.py):
study over the tuning YAML tree with median pruning and pruned/failed-trial
imputation.
"""

from __future__ import annotations

import pathlib
import sys
from typing import Callable

from pccf.config import Experiment, get_config_all
from pccf.train import ConvergenceError
from pccf.utils import tuning
from pccf.utils.tuning import Trial, TrialPruned, impute_failed_trial, impute_pruned_trial

from train_autoencoder import train_autoencoder

TUNING_DIR = pathlib.Path(__file__).resolve().parent / 'configs' / 'tuning' / 'autoencoder'


def set_objective(tune_cfg: dict) -> Callable[[Trial], float]:
    def objective(trial: Trial) -> float:
        overrides = tuning.suggest_overrides(tune_cfg, trial)
        cfg = get_config_all(overrides)
        # isolate trial artifacts under 'Trial' (like tune_w_autoencoder):
        # with name=cfg.name, every trial's final save_checkpoint would
        # overwrite the production stage-1 checkpoint store
        exp = Experiment(cfg, name='Trial', par_dir=cfg.user.path.version_dir, tags=overrides)
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
    return tuning.run_study(TUNING_DIR, set_objective, argv)


if __name__ == '__main__':
    main()
