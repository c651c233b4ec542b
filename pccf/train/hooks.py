"""Training hooks: scheduling combinators, early stopping, codebook upkeep.

Native replacements for the drytorch hook surface used by the reference
(train_autoencoder.py:48-81) plus the repo's own hooks (src/train/hooks.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np

from pccf.train.objectives import Objective
from pccf.train.runners import Diagnostic, StopTraining, Trainer


# --------------------------------------------------------------- combinators


class Hook:
    """Callable hook with ``bind`` combinators (drytorch Hook/StaticHook)."""

    def __init__(self, fn: Callable[[Trainer], None]):
        self.fn = fn

    def __call__(self, trainer: Trainer) -> None:
        self.fn(trainer)

    def bind(self, wrapper: Callable[[Callable], Callable]) -> 'Hook':
        return Hook(wrapper(self.fn))


class StaticHook(Hook):
    """Hook whose callable ignores the trainer (drytorch StaticHook)."""

    def __init__(self, fn: Callable[[], None]):
        super().__init__(lambda trainer: fn())


def call_every(n: int) -> Callable[[Callable], Callable]:
    """Run the wrapped hook only when ``trainer.model.epoch % n == 0``."""

    def wrapper(fn: Callable) -> Callable:
        def wrapped(trainer: Trainer) -> None:
            if n and trainer.model.epoch % n == 0:
                fn(trainer)

        return wrapped

    return wrapper


saving_hook = Hook(lambda trainer: trainer.save_checkpoint())


# ------------------------------------------------------------- metric filters


def get_trailing_mean(window: int) -> Callable[[list[float]], float]:
    """Mean of the last ``window`` values (drytorch get_trailing_mean)."""

    def f(history: list[float]) -> float:
        return float(np.mean(history[-window:])) if history else float('inf')

    return f


def get_moving_average(alpha: float = 0.9) -> Callable[[list[float]], float]:
    """Exponential moving average over the history (drytorch get_moving_average)."""

    def f(history: list[float]) -> float:
        if not history:
            return float('inf')
        ema = history[0]
        for v in history[1:]:
            ema = alpha * ema + (1 - alpha) * v
        return float(ema)

    return f


# ------------------------------------------------------------ early stopping


def resolve_monitored_value(metric: Objective, row: dict[str, float]) -> tuple[str, float | None]:
    """Value of ``metric`` in a logged metrics row.

    Composite criteria (e.g. ``Chamfer + EMD`` from ``get_recon_loss``) carry
    the generic name ``'Loss'``, which collides with the *training* loss key
    (embed term and all) in the log — monitoring that key would track a
    different signal than the reference's recon criterion.  For those,
    re-evaluate the composite's *loss expression* over the row's logged
    component means: this keeps scale weights, keeps multiplicative factors
    multiplicative (annealing is constant within an epoch, so the product of
    means is exact), and excludes ``|``-attached metrics-only calculations.
    """
    if metric.name != 'Loss' and metric.name in row:
        return metric.name, row[metric.name]
    expr = metric.loss_expr
    if expr is not None:
        names = list(dict.fromkeys(expr.leaf_names()))
        if names and all(name in row for name in names):
            return '+'.join(names), float(expr.evaluate(row))
    return metric.name, row.get(metric.name)


class EarlyStoppingCallback:
    """Stop when the smoothed validation metric stops improving
    (drytorch EarlyStoppingCallback; wiring at train_classifier.py:40-42)."""

    def __init__(
        self,
        metric: Objective,
        filter_fn: Callable[[list[float]], float] | None = None,
        patience: int = 10,
        monitor: str | None = None,
    ) -> None:
        self.metric = metric
        self.monitor = monitor
        self.metric_name = monitor or metric.name
        self.higher_is_better = metric.higher_is_better.get(self.metric_name, False)
        self.filter_fn = filter_fn or (lambda h: h[-1])
        self.patience = patience
        self.best = float('inf')
        self.stale = 0
        self.history: list[float] = []

    def __call__(self, trainer: Trainer) -> None:
        log = trainer.validation_log or trainer.metrics_log
        if not log:
            return
        if self.monitor is not None:
            value = log[-1].get(self.monitor)
        else:
            self.metric_name, value = resolve_monitored_value(self.metric, log[-1])
        if value is None:
            return
        if self.higher_is_better:
            value = -value
        self.history.append(float(value))
        smoothed = self.filter_fn(self.history)
        if smoothed < self.best - 1e-12:
            self.best = smoothed
            self.stale = 0
        else:
            self.stale += 1
            if self.stale >= self.patience:
                raise StopTraining(f'early stop on {self.metric_name} after {self.stale} stale epochs')


# -------------------------------------------------------- codebook optimiser


class DiscreteSpaceOptimizer:
    """Reassign unused VQ codebook entries (reference src/train/hooks.py:19-77).

    Runs a Diagnostic pass with stored outputs, counts per-slot codebook usage
    from the one-hot assignments, and rewrites unused rows to noisy copies of
    used rows (noise scale ``vq_noise``); at the final epoch dead rows are
    pushed to 1000 so they can never be selected.
    """

    def __init__(self, diagnostic: Diagnostic, trainer: Trainer, cfg) -> None:
        self.diagnostic = diagnostic
        self.trainer = trainer
        self.vq_noise = cfg.autoencoder.model.vq_noise
        self.book_size = cfg.autoencoder.model.book_size
        self.n_codes = cfg.autoencoder.model.n_codes
        self.final_epoch = cfg.autoencoder.train.n_epochs
        self.rng = np.random.default_rng(cfg.user.seed or 0)

    def __call__(self) -> None:
        from pccf.dist import is_main_process

        self.diagnostic.model = self.trainer.model
        self.diagnostic(store_outputs=True)
        new_codebook: np.ndarray | None = None
        if is_main_process():
            new_codebook = self._rewritten_codebook()
        if jax.process_count() > 1:
            # every process must install the SAME params: a rank-0-only
            # rewrite would silently diverge the replicated parameters
            # across hosts (GSPMD assumes replicated values are identical)
            from jax.experimental import multihost_utils

            current = np.asarray(
                jax.device_get(self.trainer.model.params['codebook']), np.float32
            )
            flag = np.asarray(0.0 if new_codebook is None else 1.0, np.float32)
            book = current if new_codebook is None else new_codebook.astype(np.float32)
            flag, book = multihost_utils.broadcast_one_to_all((flag, book))
            new_codebook = np.asarray(book) if float(flag) else None
        if new_codebook is None:
            return
        variables = jax.device_get(self.trainer.model.variables)
        variables['params']['codebook'] = jax.numpy.asarray(new_codebook)
        self.trainer.update_variables_from(variables)

    def _rewritten_codebook(self) -> np.ndarray | None:
        """Rank-0 codebook rewrite from the diagnostic's usage counts;
        None when every entry is in use."""
        usage = np.zeros((self.n_codes, self.book_size), dtype=np.int64)
        for out in self.diagnostic.outputs_list:
            usage += np.asarray(out.one_hot_idx).sum(axis=0).astype(np.int64)
        unused = usage == 0
        if not unused.any():
            return None
        codebook = np.array(jax.device_get(self.trainer.model.params['codebook']))
        at_final = self.trainer.model.epoch == self.final_epoch
        for slot in range(self.n_codes):
            probs = usage[slot].astype(np.float64)
            total = probs.sum()
            if total == 0:
                continue
            probs = probs / total
            for entry in range(self.book_size):
                if not unused[slot, entry]:
                    continue
                if at_final:
                    codebook[slot, entry] = 1000.0
                else:
                    template = codebook[slot, self.rng.choice(self.book_size, p=probs)]
                    noise = self.vq_noise * self.rng.standard_normal(codebook.shape[-1])
                    codebook[slot, entry] = template + noise.astype(codebook.dtype)
        return codebook


# ------------------------------------------------------- reconstruction logs


def _reconstruct(trainer: Trainer, dataset: Any, num: int) -> np.ndarray:
    """Stack the first ``num`` samples, shard on the TRAINER's mesh (which may
    be a sub-mesh when batch_size is not divisible by the device count —
    sharding on get_mesh() here would clash with where the variables live),
    and return the reconstructions as a host array."""
    from pccf.data.structures import Inputs
    from pccf.dist import shard_batch

    items = [dataset[i] for i in range(num)]
    cloud = np.stack([np.asarray(it[0].cloud) for it in items])
    inputs = shard_batch(Inputs(cloud=cloud), trainer.mesh)
    outputs = trainer.model(inputs, train=False, rng=jax.random.key(7))
    return np.asarray(jax.device_get(outputs.recon))


class TensorBoardLogReconstruction:
    """Log sample reconstructions as 3D meshes (reference hooks.py:122-162)."""

    def __init__(self, dataset: Any, num_samples: int = 1):
        from pccf.train.trackers import TensorBoardTracker

        self._dataset = dataset
        self._num = num_samples
        self.writer = TensorBoardTracker.require_current().writer
        for i in range(num_samples):
            inputs, targets = dataset[i]
            self.writer.add_mesh(
                f'Sample {i} with label: {int(targets.label)}',
                vertices=np.asarray(inputs.cloud)[None],
                global_step=0,
            )

    def __call__(self, trainer: Trainer) -> None:
        for i, recon in enumerate(_reconstruct(trainer, self._dataset, self._num)):
            self.writer.add_mesh(f'Recon {i}', vertices=recon[None], global_step=trainer.model.epoch)


class WandbLogReconstruction:
    """Wandb variant (reference hooks.py:80-119); requires the wandb tracker."""

    def __init__(self, dataset: Any, num_samples: int = 1):
        import wandb  # noqa: F401  (gated: raises if unavailable)

        from pccf.train.trackers import WandbTracker

        self._dataset = dataset
        self._num = num_samples
        self.run = WandbTracker.require_current().run
        for i in range(num_samples):
            inputs, targets = dataset[i]
            self.run.log({f'Sample {i} with label: {int(targets.label)}': wandb.Object3D(np.asarray(inputs.cloud))})

    def __call__(self, trainer: Trainer) -> None:
        import wandb

        for i, recon in enumerate(_reconstruct(trainer, self._dataset, self._num)):
            self.run.log({f'Recon {i}': wandb.Object3D(recon)})
