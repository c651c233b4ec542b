"""Metric trackers: stdout, CSV, TensorBoard, SQLite, wandb (gated).

Native replacement for the drytorch tracker fan-out wired by the reference
(src/config/experiment.py:22-64).  Each tracker implements ``start(exp)``,
``log_metrics(model, source, epoch, metrics)`` and ``stop()``; selection
follows the same config flags (user_settings.yaml trackers block).  The
SQLAlchemy tracker becomes a stdlib-sqlite tracker with the same metrics.db
artifact.
"""

from __future__ import annotations

import csv
import logging
import pathlib
import shutil
import sqlite3
from typing import Any

logger = logging.getLogger('pccf')


class TrackerNotUsedError(RuntimeError):
    """Requested tracker is not subscribed (drytorch parity)."""


class _CurrentMixin:
    _current: Any = None

    @classmethod
    def require_current(cls):
        if cls._current is None:
            raise TrackerNotUsedError(f'{cls.__name__} is not active')
        return cls._current


class BuiltinLogger:
    """Stdout/logging metrics printer."""

    def start(self, exp) -> None:
        logging.basicConfig(level=logging.INFO, format='%(message)s')
        logger.info('experiment %s -> %s', exp.exp_name, exp.exp_dir)

    def log_metrics(self, model: str, source: str, epoch: int, metrics: dict[str, float]) -> None:
        parts = ', '.join(f'{k}: {v:.4g}' for k, v in metrics.items())
        logger.info('[%s/%s] epoch %d: %s', model, source, epoch, parts)

    def stop(self) -> None:
        pass


class CSVDumper:
    """Per-(model, source) CSV metric logs under the experiment directory."""

    def __init__(self) -> None:
        self.dir: pathlib.Path | None = None
        self._writers: dict[tuple[str, str], tuple[Any, csv.DictWriter, list[str]]] = {}

    def start(self, exp) -> None:
        self.dir = exp.exp_dir / 'metrics'
        self.dir.mkdir(parents=True, exist_ok=True)

    def log_metrics(self, model: str, source: str, epoch: int, metrics: dict[str, float]) -> None:
        if self.dir is None:
            return
        key = (model, source)
        row = {'epoch': epoch, **metrics}
        path = self.dir / f'{model}_{source}.csv'
        if key not in self._writers:
            # resume-safe: adopt the existing file's header so appended rows
            # stay aligned; new metric names extend it via a rewrite
            fields: list[str] = []
            if path.exists() and path.stat().st_size > 0:
                with open(path, newline='') as rf:
                    fields = next(csv.reader(rf), []) or []
            existing = list(fields)
            fields += [f for f in row if f not in fields]
            if existing and fields != existing:
                self._rewrite(path, fields)
            fh = open(path, 'a', newline='')
            writer = csv.DictWriter(fh, fieldnames=fields, restval='')
            if path.stat().st_size == 0:
                writer.writeheader()
            self._writers[key] = (fh, writer, fields)
        fh, writer, fields = self._writers[key]
        new = [f for f in row if f not in fields]
        if new:  # a metric appeared mid-run: rewrite with the extended header
            fields = fields + new
            fh.close()
            self._rewrite(path, fields)
            fh = open(path, 'a', newline='')
            writer = csv.DictWriter(fh, fieldnames=fields, restval='')
            self._writers[key] = (fh, writer, fields)
        writer.writerow(row)
        fh.flush()

    @staticmethod
    def _rewrite(path: pathlib.Path, fields: list[str]) -> None:
        """Rewrite an existing CSV under a (possibly extended) header."""
        rows: list[dict[str, Any]] = []
        if path.exists() and path.stat().st_size > 0:
            with open(path, newline='') as rf:
                rows = list(csv.DictReader(rf))
        with open(path, 'w', newline='') as wf:
            writer = csv.DictWriter(wf, fieldnames=fields, restval='')
            writer.writeheader()
            for r in rows:
                writer.writerow({k: v for k, v in r.items() if k in fields})

    def stop(self) -> None:
        for fh, _, _ in self._writers.values():
            fh.close()
        self._writers = {}


class TensorBoardTracker(_CurrentMixin):
    """tensorboardX event files under <exp_dir>/tb."""

    def __init__(self) -> None:
        self.writer = None

    def start(self, exp) -> None:
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(logdir=str(exp.exp_dir / 'tb'))
        TensorBoardTracker._current = self

    def log_metrics(self, model: str, source: str, epoch: int, metrics: dict[str, float]) -> None:
        if self.writer is None:
            return
        for name, value in metrics.items():
            self.writer.add_scalar(f'{model}/{source}/{name}', value, epoch)

    def stop(self) -> None:
        if self.writer is not None:
            self.writer.close()
        TensorBoardTracker._current = None

    @classmethod
    def get_current(cls):
        return cls.require_current()


class SQLiteTracker:
    """metrics.db with a flat metrics table (replaces the sqlalchemy tracker)."""

    def __init__(self) -> None:
        self.conn: sqlite3.Connection | None = None

    def start(self, exp) -> None:
        self.conn = sqlite3.connect(exp.exp_dir / 'metrics.db')
        self.conn.execute(
            'CREATE TABLE IF NOT EXISTS metrics '
            '(model TEXT, source TEXT, epoch INTEGER, name TEXT, value REAL)'
        )
        self.conn.commit()

    def log_metrics(self, model: str, source: str, epoch: int, metrics: dict[str, float]) -> None:
        if self.conn is None:
            return
        self.conn.executemany(
            'INSERT INTO metrics VALUES (?, ?, ?, ?, ?)',
            [(model, source, epoch, k, float(v)) for k, v in metrics.items()],
        )
        self.conn.commit()

    def stop(self) -> None:
        if self.conn is not None:
            self.conn.close()
            self.conn = None


class HydraLinkTracker:
    """Persists the composed config JSON (the reference's hydra tracker keeps
    the hydra output dir; composition here is native, so we keep the tree)."""

    def start(self, exp) -> None:
        # one serialization path: Experiment._dump_config already writes
        # config.json for every run — alias it instead of re-implementing
        # asdict+json here (which had drifted in error handling)
        src = exp.exp_dir / 'config.json'
        try:
            if not src.exists():
                exp._dump_config()
            shutil.copyfile(src, exp.exp_dir / 'composed_config.json')
        except OSError as err:
            logging.getLogger('pccf').warning('could not persist composed config: %s', err)

    def log_metrics(self, **kwargs) -> None:
        pass

    def stop(self) -> None:
        pass


class WandbTracker(_CurrentMixin):
    """wandb tracker (gated: only constructible when wandb is installed)."""

    def __init__(self) -> None:
        import wandb  # raises ImportError if unavailable

        self._wandb = wandb
        self.run = None

    def start(self, exp) -> None:
        self.run = self._wandb.init(project=exp.config.project, name=exp.exp_name, tags=exp.tags)
        WandbTracker._current = self

    def log_metrics(self, model: str, source: str, epoch: int, metrics: dict[str, float]) -> None:
        if self.run is not None:
            self.run.log({f'{model}/{source}/{k}': v for k, v in metrics.items()}, step=epoch)

    def stop(self) -> None:
        if self.run is not None:
            self.run.finish()
        WandbTracker._current = None

    @classmethod
    def get_current(cls):
        return cls.require_current()


def get_trackers(cfg) -> list[Any]:
    """Build the tracker list from config flags (reference experiment.py:22-64)
    with graceful import fallbacks."""
    trackers: list[Any] = [BuiltinLogger()]
    flags = cfg.user.trackers
    if flags.csv:
        trackers.append(CSVDumper())
    if flags.hydra:
        trackers.append(HydraLinkTracker())
    if flags.tensorboard:
        try:
            import tensorboardX  # noqa: F401

            trackers.append(TensorBoardTracker())
        except ImportError:
            logger.info('tensorboardX unavailable; skipping TensorBoard tracker')
    if flags.sqlalchemy:
        trackers.append(SQLiteTracker())
    if flags.wandb:
        try:
            trackers.append(WandbTracker())
        except ImportError:
            logger.info('wandb unavailable; skipping tracker')
    return trackers
