"""Visualize the w_decoder tuning study (reference plot_optimization_w_decoder.py)."""

from __future__ import annotations

import pathlib
import sys

from pccf.config import compose
from pccf.config.environment import VERSION
from pccf.utils import tuning

TUNING_DIR = pathlib.Path(__file__).resolve().parent / 'configs' / 'tuning' / 'w_autoencoder'


def main(study_group: str = 'w_decoder') -> None:
    tune_cfg = compose(TUNING_DIR, 'defaults', overrides=[f'tune={study_group}'] + sys.argv[1:])
    t = tune_cfg['tune']
    study_name = tuning.get_study_name(
        f'v{VERSION}', 'main', t['study_name'], tune_cfg.get('overrides', [])
    )
    study = tuning.create_study(study_name=study_name, storage=tune_cfg['storage'])
    out = tuning.visualize_study(study, pathlib.Path(tune_cfg['db_location']) / study_name)
    print('\n'.join(str(p) for p in out) or 'no completed trials to plot')


if __name__ == '__main__':
    main()
