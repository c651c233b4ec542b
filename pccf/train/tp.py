"""Tensor-parallel training over a 2-D ``(dp, mp)`` mesh.

This makes the TP capability real rather than a layout demo: the SAME jitted
train step the :class:`~pccf.train.runners.Trainer` compiles for data
parallelism is invoked with column-sharded parameters (and a matching
optimiser state) plus a ``dp``-sharded batch.  Under GSPMD the activation
all-gathers over ``mp`` and the gradient reduce-scatters are derived by XLA
from the parameter layout alone — no hand-written collectives.

The reference framework is data-parallel only (SURVEY §2.7,
src/utils/parallel.py:17-66); TP is a pccf extension for scaling the large
dense/transformer kernels past one chip's HBM.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pccf.dist.sharding import shard_params_tp
from pccf.train.runners import Trainer, TrainState


def _tp_opt_state(tx, params: Any, mesh: Mesh, min_size: int) -> Any:
    """Optimiser state with moments column-sharded like their parameters.

    ``jit(tx.init)`` alone leaves the moments replicated: they are created by
    ``zeros_like`` (a broadcast with no operand to propagate sharding from).
    Optax state subtrees mirror the params tree *including key names*, so the
    same per-leaf rule (``tp_spec``: 'kernel'/'embedding' leaves with a large
    divisible last dim go column-parallel) places them consistently; scalar
    counts fall to replicated.
    """
    opt_state = jax.jit(tx.init)(params)
    return shard_params_tp(opt_state, mesh, min_size=min_size)


def _probe_tx(trainer: Any):
    """Per-leaf optimiser for the TP probe path, cached on the trainer.

    The trainer's own tx may be optax.flatten-wrapped (the DP fast path);
    flattening concatenates every param leaf into one vector, which on
    column-sharded TP params forces a full all-gather/re-shard per step —
    the probe always runs per-leaf (identical math, see the flatten parity
    test).  The trainer's ``_tx``/``_train_fn`` are never touched, so DP
    stepping on the same trainer keeps its own (possibly flat) state.
    """
    if getattr(trainer, '_tp_probe_tx', None) is None:
        trainer._tp_probe_tx = trainer._make_tx(flat=False)
    return trainer._tp_probe_tx


def tp_state(trainer: Any, mesh: Mesh, min_size: int = 32, tx: Any = None):
    """TrainState with column-parallel params and a matching optimiser state.

    The moments are explicitly re-sharded to the parameter layout by
    :func:`_tp_opt_state` (``jit(tx.init)`` alone would leave them
    replicated — see its docstring; the explicit ``shard_params_tp`` call
    is load-bearing).

    Deliberately avoids ``trainer.prepare()``: that would materialise the
    fully-replicated data-parallel TrainState (params + fresh Adam moments on
    every device) only to discard it — doubling peak HBM on exactly the
    models TP exists to serve.  Only the optimiser definition is needed here.
    """
    if tx is None:
        tx = _probe_tx(trainer)
    params = shard_params_tp(jax.device_get(trainer.model.params), mesh, min_size=min_size)
    opt_state = _tp_opt_state(tx, params, mesh, min_size)
    step = trainer.model.epoch * trainer._steps_per_epoch()
    if step:
        # same weights-only-resume alignment as Trainer._ensure_state and
        # TPTrainer._ensure_state: the LR schedule reads optax's internal
        # count, which init set to 0 — without this a probe on a resumed
        # model applies schedule(0) while the DP step it is compared
        # against applies schedule(step)
        from pccf.train.runners import _set_opt_counts

        opt_state = _set_opt_counts(opt_state, step)
        repl = NamedSharding(mesh, P())
        opt_state = jax.tree.map(
            lambda leaf: jax.device_put(leaf, repl)
            if getattr(leaf, 'ndim', None) == 0
            else leaf,
            opt_state,
        )
    stats = trainer.model.batch_stats
    stats = jax.device_get(stats) if stats is not None else {}
    return TrainState(
        params=params,
        batch_stats=stats,
        opt_state=opt_state,
        step=jnp.asarray(step, jnp.int32),
    )


def tp_train_step(
    trainer: Any,
    mesh: Mesh,
    inputs: Any,
    targets: Any,
    rng: jax.Array,
    epoch: float,
    min_size: int = 32,
    return_state: bool = False,
):
    """Run ONE tensor-parallel training step; returns host metrics.

    ``mesh`` must carry ``('dp', 'mp')`` axes (see
    :func:`pccf.dist.sharding.make_2d_mesh`).  The step compiles a TP variant
    of the trainer's train step — same math, different layout — so metrics and
    updated parameters match the data-parallel step to float tolerance
    (asserted by tests/test_tp.py).

    One-shot equivalence probe: it re-shards the trainer's params on every
    call.  For actual training on a (dp, mp) mesh use :class:`TPTrainer`,
    which persists the TP-sharded state across steps and epochs.
    """
    from pccf.dist.mesh import shard_batch

    tx = _probe_tx(trainer)
    state = tp_state(trainer, mesh, min_size=min_size, tx=tx)
    if getattr(trainer, '_tp_probe_fn', None) is None:
        # jitted step closing over the probe's per-leaf tx — cached separately
        # from trainer._train_fn (whose tx may be flatten-wrapped for DP)
        trainer._tp_probe_fn = trainer._build_train_step(tx=tx)
    binputs = shard_batch(inputs, mesh, strict=True)
    btargets = shard_batch(targets, mesh, strict=True)
    new_state, metrics = trainer._tp_probe_fn(
        state, binputs, btargets, rng, jnp.asarray(epoch, jnp.float32)
    )
    jax.block_until_ready(new_state.params)
    host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
    if return_state:
        return host_metrics, new_state
    return host_metrics


class TPTrainer(Trainer):
    """Trainer over a 2-D ``(dp, mp)`` mesh with persistent TP-sharded state.

    Same epoch-loop surface as :class:`~pccf.train.runners.Trainer` — the
    differences are placement only:

    - parameters live column-sharded over ``mp`` (``shard_params_tp``) and
      STAY sharded across steps and epochs (no per-call re-sharding);
    - the optimiser state is initialised under jit from the sharded params so
      its moments inherit the layout via sharding propagation;
    - batches shard over ``dp`` and replicate over ``mp``
      (``shard_batch`` checks divisibility against the dp axis alone).

    The train step itself is the base class's jitted function: GSPMD derives
    the mp all-gathers/reduce-scatters from the parameter layout alone.
    """

    flatten_optimizer = False  # params are column-sharded; see Trainer._make_tx

    def __init__(self, model, loader, loss, learning_schema, mesh: Mesh, min_size: int = 32, frozen: tuple[str, ...] = ()):
        if not {'dp', 'mp'} <= set(dict(mesh.shape)):
            raise ValueError(
                f"TPTrainer needs a ('dp', 'mp') mesh, got axes {tuple(dict(mesh.shape))}"
            )
        super().__init__(model, loader, loss, learning_schema, frozen=frozen, mesh=mesh)
        self.min_size = min_size

    def _ensure_state(self) -> 'TrainState':
        if self._state is None:
            self._tx = self._make_tx()
            params = shard_params_tp(
                jax.device_get(self.model.params), self.mesh, min_size=self.min_size
            )
            opt_state = _tp_opt_state(self._tx, params, self.mesh, self.min_size)
            step = self.model.epoch * self._steps_per_epoch()
            if step:
                # same weights-only-resume alignment as the base class
                # (runners.py _ensure_state): the LR schedule reads optax's
                # internal count, which init set to 0 — without this a TP
                # resume silently restarts warmup/decay from epoch 0.  The
                # fresh count scalars default to single-device placement,
                # which clashes with the mesh-placed state under jit — put
                # every scalar leaf back replicated over the mesh.
                from pccf.train.runners import _set_opt_counts

                opt_state = _set_opt_counts(opt_state, step)
                repl = NamedSharding(self.mesh, P())
                opt_state = jax.tree.map(
                    lambda leaf: jax.device_put(leaf, repl)
                    if getattr(leaf, 'ndim', None) == 0
                    else leaf,
                    opt_state,
                )
            stats = self.model.batch_stats
            if stats is not None and jax.tree.leaves(stats):
                repl = NamedSharding(self.mesh, P())
                stats = jax.tree.map(
                    lambda x: jax.device_put(np.asarray(x), repl), jax.device_get(stats)
                )
            else:
                stats = {}
            self._state = TrainState(
                params=params,
                batch_stats=stats,
                opt_state=opt_state,
                step=jnp.asarray(step, jnp.int32),
            )
        return self._state
