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

from pccf.config import Experiment, get_config_all
from pccf.train import ConvergenceError
from pccf.utils import tuning
from pccf.utils.tuning import Trial, TrialPruned, impute_failed_trial, impute_pruned_trial

from train_w_autoencoder import load_models, train_w_autoencoder

TUNING_DIR = pathlib.Path(__file__).resolve().parent / 'configs' / 'tuning' / 'w_autoencoder'


def split_frozen_outer(vqvae) -> tuple[dict, dict]:
    """Everything of the trained VQVAE except the inner CVAE, as
    (params, batch_stats) subtrees ready to graft onto a fresh trial model.

    The reference filters ``w_autoencoder`` keys out of the *state dict*
    (tune_w_autoencoder.py:41), which carries the BatchNorm running buffers
    alongside the weights — the frozen encoder runs in eval mode inside every
    trial, so grafting params alone would normalise each trial's latent
    dataset with the fresh model's zero-mean/unit-var statistics.
    """
    frozen_outer = {k: v for k, v in vqvae.params.items() if k != 'w_autoencoder'}
    frozen_stats = {k: v for k, v in (vqvae.batch_stats or {}).items() if k != 'w_autoencoder'}
    return frozen_outer, frozen_stats


def graft_frozen_outer(new_vqvae, frozen_outer: dict, frozen_stats: dict) -> None:
    """Overwrite the outer subtrees of a freshly-initialised trial model,
    keeping its fresh inner CVAE params."""
    params = dict(new_vqvae.params)
    params.update(frozen_outer)
    new_vqvae.params = params
    if frozen_stats:
        stats = dict(new_vqvae.batch_stats or {})
        stats.update(frozen_stats)
        new_vqvae.variables = {**new_vqvae.variables, 'batch_stats': stats}


def set_objective(tune_cfg: dict) -> Callable[[Trial], float]:
    # compose the frozen outer models with the study's fixed overrides, so
    # they match what every trial composes (suggest_overrides prepends
    # tune_cfg['overrides'] to each trial's config) — otherwise a dataset or
    # outer-model override would graft wrong-shaped frozen weights
    main_cfg = get_config_all(list(tune_cfg.get('overrides', [])))
    main_exp = Experiment(main_cfg, name=main_cfg.name, par_dir=main_cfg.user.path.version_dir)
    with main_exp.create_run(resume=True, record=False):
        classifier, vqvae = load_models(main_cfg)
    # share the frozen outer weights + BN running stats across trials
    frozen_outer, frozen_stats = split_frozen_outer(vqvae)

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
            graft_frozen_outer(new_vqvae, frozen_outer, frozen_stats)
            try:
                train_w_autoencoder(cfg, new_vqvae, classifier, trial=trial)
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
