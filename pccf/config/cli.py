"""CLI entry-point glue: the framework's ``hydra_main`` equivalent.

Composes ``configs/experiment`` with ``sys.argv`` overrides, validates into
the typed :class:`~pccf.config.specs.AllConfig`, and passes it to the wrapped
main function (reference src/config/hydra.py:21-35).
"""

from __future__ import annotations

import functools
import pathlib
import sys
from typing import Any, Callable

from pccf.config.compose import compose
from pccf.config.experiment import update_exp_name
from pccf.config.specs import AllConfig, validate_config

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
DEFAULT_CONFIG_DIR = _REPO_ROOT / 'configs' / 'experiment'


def get_config_all(
    overrides: list[str] | None = None,
    config_dir: str | pathlib.Path = DEFAULT_CONFIG_DIR,
    config_name: str = 'defaults',
) -> AllConfig:
    """Programmatic compose (reference ``get_config_all``, hydra.py:38-52)."""
    tree = compose(config_dir, config_name, overrides=overrides)
    cfg = validate_config(tree)
    if cfg.user.seed is not None:
        _seed_numpy(cfg.user.seed)
    if cfg.user.platform is not None:
        _apply_platform(cfg.user.platform)
    return cfg


def _seed_numpy(seed: int) -> None:
    import numpy as np

    np.random.seed(seed)


def _apply_platform(platform: str) -> None:
    """Apply ``user.cpu=true`` (reference parallel.py:46-51 gloo/CPU path).

    Must run before jax initialises its backends; the sitecustomize-pinned
    ``JAX_PLATFORMS`` env var alone is not enough, so set the config flag
    too. A no-op (with a warning) if jax already picked its backend.
    """
    import os
    import warnings

    os.environ['JAX_PLATFORMS'] = platform
    import jax

    try:
        jax.config.update('jax_platforms', platform)
    except Exception as e:  # pragma: no cover - defensive
        warnings.warn(f'could not apply user platform {platform!r}: {e}', stacklevel=2)
        return
    # only VERIFY against an already-initialised backend: calling
    # jax.devices() here would itself initialise the backend during config
    # composition, before the entry point's initialize_distributed() — which
    # breaks multi-host startup (jax.distributed must init first)
    from jax._src import xla_bridge

    if not xla_bridge._backends:
        return  # backend not up yet; the config update is sufficient
    backend = jax.devices()[0].platform
    if backend != platform:
        warnings.warn(
            f'user requested platform {platform!r} but jax initialised {backend!r} '
            'before config composition; restart the process with '
            f'JAX_PLATFORMS={platform}',
            stacklevel=2,
        )


def hydra_main(fn: Callable[[AllConfig], Any]) -> Callable[[], Any]:
    """Decorator: compose config from CLI args and call ``fn(cfg)``.

    Supports Hydra-style args: ``key=value`` overrides, ``group/sub=option``
    selections, ``--config-dir DIR``, ``--config-name NAME``.
    """

    @functools.wraps(fn)
    def wrapper() -> Any:
        argv = sys.argv[1:]
        config_dir: str | pathlib.Path = DEFAULT_CONFIG_DIR
        config_name = 'defaults'
        overrides: list[str] = []
        it = iter(argv)
        for arg in it:
            if arg in ('--config-dir', '--config-name') or arg.startswith(
                ('--config-dir=', '--config-name=')
            ):
                if '=' in arg:
                    flag, value = arg.split('=', 1)
                else:
                    flag = arg
                    value = next(it, None)
                    if value is None:
                        raise SystemExit(f'{flag} requires a value')
                if flag == '--config-dir':
                    config_dir = value
                else:
                    config_name = value
            elif arg.startswith('--'):
                raise SystemExit(
                    f'unknown flag {arg!r} (supported: --config-dir, --config-name)'
                )
            else:
                overrides.append(arg)
        cfg = get_config_all(overrides, config_dir, config_name)
        # fold overrides into the VARIATION (cfg.name re-appends '_final'
        # when final=True; folding into cfg.name would double the marker)
        name, tags = update_exp_name(cfg.variation, overrides)
        cfg.variation = name
        cfg.tags.extend(tags)
        return fn(cfg)

    return wrapper
