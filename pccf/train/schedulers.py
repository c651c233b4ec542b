"""Learning-rate schedules with restart + warmup decorators.

Native replacement for the drytorch scheduler surface used by the reference
(src/train/learning_schema.py:8-26): ``Constant``/``Cosine``/``Exponential``
base schedules composed with ``restart(interval, fraction)`` and
``warmup(steps)``.  Schedules are pure functions of the (possibly fractional)
epoch, so they can be evaluated on host per epoch or traced per step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

Schedule = Callable[[float], float]


def constant_scheduler() -> Schedule:
    return lambda epoch: 1.0


def cosine_scheduler(min_decay: float = 0.01, decay_steps: int = 100) -> Schedule:
    """Cosine decay from 1 to ``min_decay`` over ``decay_steps`` epochs."""

    def f(epoch: float) -> float:
        t = min(epoch, decay_steps) / max(decay_steps, 1)
        return min_decay + (1.0 - min_decay) * 0.5 * (1.0 + math.cos(math.pi * t))

    return f


def exponential_scheduler(exp_decay: float = 0.975) -> Schedule:
    """Multiplicative decay per epoch.

    Strict kwargs like :func:`cosine_scheduler`: a typo'd or leftover
    settings key must raise, not silently fall back to the default decay."""
    return lambda epoch: exp_decay**epoch


def restart(base: Schedule, restart_interval: int, restart_fraction: float = 1.0) -> Schedule:
    """Restart the base schedule every ``restart_interval`` epochs, scaling the
    amplitude by ``restart_fraction`` at each restart."""
    if restart_interval <= 0:
        return base

    def f(epoch: float) -> float:
        k = int(epoch // restart_interval)
        local = epoch - k * restart_interval
        return (restart_fraction**k) * base(local)

    return f


def warmup(base: Schedule, warmup_steps: int) -> Schedule:
    """Linear ramp over the first ``warmup_steps`` epochs."""
    if warmup_steps <= 0:
        return base

    def f(epoch: float) -> float:
        ramp = min(1.0, (epoch + 1.0) / warmup_steps)
        return ramp * base(epoch)

    return f


@dataclasses.dataclass
class LearningSchema:
    """Everything the trainer needs to build its optimiser (drytorch parity:
    src/train/learning_schema.py:55-61)."""

    optimizer_factory: Callable  # (lr, **opt_settings) -> optax transform
    base_lr: float
    schedule: Schedule
    opt_settings: dict
    gradient_op_name: str | None = None
    clip_criterion: str = 'ZStat'

    def lr_at(self, epoch: float) -> float:
        return self.base_lr * self.schedule(epoch)


def get_scheduler(config) -> Schedule:
    """Scheduler from :class:`~pccf.config.specs.SchedulerConfig`
    (learning_schema.py:8-26)."""
    from pccf.config.options import Schedulers

    if config.function == Schedulers.Constant:
        base = constant_scheduler()
    elif config.function == Schedulers.Cosine:
        base = cosine_scheduler(**config.settings)
    elif config.function == Schedulers.Exponential:
        base = exponential_scheduler(**config.settings)
    else:
        raise ValueError(f'Scheduler {config.function} not supported.')
    base = restart(base, config.restart_interval, config.restart_fraction)
    return warmup(base, config.warmup_steps)


def get_learning_schema(exp_cfg) -> LearningSchema:
    """Build the learning schema from an experiment config
    (learning_schema.py:55-61)."""
    learn = exp_cfg.train.learn
    return LearningSchema(
        optimizer_factory=learn.optimizer_cls,
        base_lr=learn.learning_rate,
        schedule=get_scheduler(learn.scheduler),
        opt_settings=dict(learn.opt_settings),
        gradient_op_name=str(learn.grad_op) if learn.grad_op else None,
        clip_criterion=str(learn.clip_criterion),
    )
