"""Model wrapper: variables + epoch + checkpointing.

Native replacement for the drytorch ``Model`` surface consumed by the
reference (train_classifier.py:27, train_w_autoencoder.py:84-100):
device placement, ``.epoch``, ``save_state``/``load_state``, and a
``checkpoint`` handle with indexed load (-1 = latest, user_settings.yaml:10).

Checkpoints are Orbax; the layout is one directory per epoch under
``<exp_dir>/models/<name>/checkpoints/``.
"""

from __future__ import annotations

import functools
import pathlib
import re
from typing import Any, Callable

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import linen as nn

from pccf.config.experiment import Experiment

Array = jax.Array


@functools.lru_cache(maxsize=1)
def shared_checkpointer() -> ocp.StandardCheckpointer:
    """One process-wide orbax checkpointer (save/restore are reusable).

    Each StandardCheckpointer spawns background async resources that are
    never closed; constructing one per save leaked a thread per checkpoint
    over a long run."""
    return ocp.StandardCheckpointer()


class Checkpoint:
    """Indexed checkpoint store for a model (drytorch ``model.checkpoint``)."""

    def __init__(self, model: 'Model') -> None:
        self.model = model

    @property
    def directory(self) -> pathlib.Path:
        exp = Experiment.current()
        return exp.exp_dir / 'models' / self.model.name / 'checkpoints'

    def _epochs(self) -> list[int]:
        if not self.directory.exists():
            return []
        out = []
        for p in self.directory.iterdir():
            m = re.fullmatch(r'epoch_(\d+)', p.name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def save(self) -> pathlib.Path:
        """Persist variables + epoch.  Deliberately no ``extra`` payload:
        :meth:`load` restores against this fixed template, so extra keys
        could never round-trip — side-state (e.g. the optimiser) gets its
        own sidecar (Trainer.save_checkpoint, runners.py)."""
        path = self.directory / f'epoch_{self.model.epoch}'
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {'variables': self.model.variables, 'epoch': self.model.epoch}
        ckptr = shared_checkpointer()
        ckptr.save(path.resolve(), payload, force=True)
        ckptr.wait_until_finished()
        return path

    def load(self, checkpoint: int = -1) -> dict[str, Any]:
        epochs = self._epochs()
        if not epochs:
            raise FileNotFoundError(f'No checkpoints under {self.directory}')
        epoch = epochs[checkpoint] if checkpoint < 0 else checkpoint
        if epoch not in epochs:
            raise FileNotFoundError(f'Checkpoint epoch {epoch} not in {epochs}')
        path = (self.directory / f'epoch_{epoch}').resolve()
        ckptr = shared_checkpointer()
        template = {'variables': self.model.variables, 'epoch': 0}
        payload = ckptr.restore(path, template)
        self.model.variables = payload['variables']
        self.model.epoch = int(payload['epoch'])
        return payload


class Model:
    """A linen module + its variables, tracked epoch, and checkpoint store."""

    def __init__(
        self,
        module: nn.Module,
        name: str,
        variables: dict[str, Any] | None = None,
        seed: int = 0,
    ) -> None:
        self.module = module
        self.name = name
        self.variables = variables or {}
        self.epoch = 0
        self.seed = seed
        self.checkpoint = Checkpoint(self)

    # ---------------------------------------------------------------- init
    def initialize(self, *init_args, method: str | Callable | None = None, **init_kwargs) -> None:
        """Materialise parameters (init RNGs derived from the model seed)."""
        if self.variables:
            return
        rngs = {
            'params': jax.random.key(self.seed),
            'sampling': jax.random.key(self.seed + 1),
            'dropout': jax.random.key(self.seed + 2),
        }
        self.variables = self.module.init(rngs, *init_args, method=method, **init_kwargs)

    @property
    def params(self):
        return self.variables.get('params', {})

    @params.setter
    def params(self, new):
        self.variables = {**self.variables, 'params': new}

    @property
    def batch_stats(self):
        return self.variables.get('batch_stats')

    def n_parameters(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))

    # ---------------------------------------------------------- state (API)
    def save_state(self) -> None:
        self.checkpoint.save()

    def load_state(self, checkpoint: int = -1) -> None:
        self.checkpoint.load(checkpoint)

    # -------------------------------------------------------------- calling
    def apply(self, *args, rngs=None, method=None, mutable=False, **kwargs):
        return self.module.apply(self.variables, *args, rngs=rngs, method=method, mutable=mutable, **kwargs)

    def __call__(self, inputs, train: bool = False, rng: Array | None = None):
        """Convenience eval call (classifier-style modules)."""
        rngs = None
        if rng is not None:
            rngs = {'sampling': rng, 'dropout': jax.random.fold_in(rng, 1)}
        return self.module.apply(self.variables, inputs, train=train, rngs=rngs)


class ModelEpoch(Model):
    """Marker subclass: the runner injects the epoch into ``Outputs`` so
    epoch-annealed losses see it (reference src/train/models.py:8-14).

    The base runner already injects ``model_epoch`` whenever outputs are an
    ``Outputs`` struct, so this subclass exists for API familiarity."""
