"""Experiment context: global config access + run directory management.

Replaces the drytorch ``Experiment`` singleton surface consumed by the
reference (src/config/experiment.py:16-19, every module's
``Experiment.get_config()``).  In pccf, modules take explicit configs; the
singleton exists for script-level orchestration and tracker wiring.
"""

from __future__ import annotations

import contextlib
import json
import pathlib
from dataclasses import asdict
from typing import Any, Iterator

from pccf.config.specs import AllConfig


class Experiment:
    """Holds the active configuration and experiment/run directories."""

    _current: Experiment | None = None

    def __init__(
        self,
        config: AllConfig,
        name: str | None = None,
        par_dir: str | pathlib.Path | None = None,
        tags: list[str] | None = None,
    ) -> None:
        self.config = config
        self.exp_name = name or config.name
        self.par_dir = pathlib.Path(par_dir) if par_dir else config.user.path.version_dir
        self.tags = list(tags or config.tags)
        self.trackers: list[Any] = []

    # -- global access ------------------------------------------------------
    @classmethod
    def get_config(cls) -> AllConfig:
        if cls._current is None:
            raise RuntimeError('No active Experiment; call Experiment(cfg).create_run() first.')
        return cls._current.config

    @classmethod
    def current(cls) -> Experiment:
        if cls._current is None:
            raise RuntimeError('No active Experiment.')
        return cls._current

    # -- runs ---------------------------------------------------------------
    @property
    def exp_dir(self) -> pathlib.Path:
        return self.par_dir / self.exp_name

    def subscribe(self, tracker: Any) -> None:
        self.trackers.append(tracker)

    @contextlib.contextmanager
    def create_run(self, resume: bool = False, record: bool = True) -> Iterator[Experiment]:
        """Activate this experiment, prepare its directory, notify trackers."""
        del resume  # checkpoint selection is handled by the Model layer
        prev = Experiment._current
        Experiment._current = self
        try:
            if record:
                self.exp_dir.mkdir(parents=True, exist_ok=True)
                self._dump_config()
            for tracker in self.trackers:
                start = getattr(tracker, 'start', None)
                if start:
                    start(self)
            yield self
        finally:
            for tracker in self.trackers:
                stop = getattr(tracker, 'stop', None)
                if stop:
                    try:
                        stop()
                    except Exception:
                        pass
            Experiment._current = prev

    def _dump_config(self) -> None:
        try:
            blob = asdict(self.config)
        except TypeError:
            blob = {'repr': repr(self.config)}
        path = self.exp_dir / 'config.json'
        path.write_text(json.dumps(blob, default=str, indent=2))


def set_tuning_logging() -> None:
    """Quiet per-epoch logging during hyper-parameter studies
    (reference experiment.py:80-88)."""
    import logging

    logging.getLogger('pccf').setLevel(logging.WARNING)


def update_exp_name(cfg_name: str, overrides: list[str]) -> tuple[str, list[str]]:
    """Fold CLI overrides into the experiment name + tags (experiment.py:67-77).

    The name is a single path component: group-selection keys carry a '/'
    (``data/dataset=...``) which would silently nest experiment directories,
    so every separator is flattened to '-'.
    """
    tags = [ov for ov in overrides if '=' in ov]
    suffix = '_'.join(
        t.split('=')[0].split('.')[-1].split('/')[-1] + '-' + t.split('=', 1)[1]
        for t in tags[:4]
    ).replace('/', '-')
    name = f'{cfg_name}_{suffix}' if suffix else cfg_name
    return name[:255], tags
