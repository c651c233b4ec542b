"""Training / evaluation runners: Trainer, Test, Diagnostic.

Native replacement for the drytorch runner surface the reference builds on
(train_autoencoder.py:42-44, train_classifier.py:33-49): a ``Trainer`` with
``train_until`` / ``add_validation`` / ``post_epoch_hooks`` /
``save_checkpoint``; ``Test`` with ``store_outputs`` and a merged metric
state; ``Diagnostic`` for model-in-eval passes over the training set.

TPU design: one jitted train step per (model, loss); the global batch is
sharded over the ``dp`` mesh axis, parameters are replicated, and gradient
averaging is the GSPMD collective inserted by XLA.  The LR schedule is a pure
function of the step counter, so the whole epoch loop never leaves device
except for data feeding and metric logging.

Note on BatchNorm: statistics are computed over the *global* batch (GSPMD
semantics), not per-replica as in the reference's DDP default — documented
deviation; all configs here use small per-device batches where global stats
are the better estimator.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pccf.config.experiment import Experiment
from pccf.data.structures import Outputs
from pccf.dist import get_mesh, replicate, shard_batch
from pccf.dist import mesh as mesh_mod
from pccf.train.grad_ops import get_grad_op
from pccf.train.loader import DataLoader
from pccf.train.model import Model
from pccf.train.objectives import Objective
from pccf.train.schedulers import LearningSchema

logger = logging.getLogger('pccf')

Array = jax.Array


class ConvergenceError(RuntimeError):
    """Loss diverged (drytorch parity; caught and imputed by tuning)."""


class StopTraining(Exception):
    """Raised by hooks (early stopping) to end the epoch loop."""


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def _inject_epoch(outputs: Any, epoch: Array) -> Any:
    if isinstance(outputs, Outputs):
        return outputs.replace(model_epoch=epoch)
    return outputs


class _Runner:
    """Shared eval machinery."""

    def __init__(self, model: Model, loader: DataLoader, objective: Objective, name: str = ''):
        self.model = model
        self.loader = loader
        self.objective = objective.copy()
        self.name = name or type(self).__name__
        self.mesh = get_mesh()
        self.outputs_list: list[Any] = []
        self._eval_fn = None

    def _build_eval(self):
        module = self.model.module
        objective = self.objective

        def eval_step(variables, inputs, targets, rng, epoch):
            rngs = {'sampling': rng, 'dropout': jax.random.fold_in(rng, 1)}
            outputs = module.apply(variables, inputs, train=False, rngs=rngs)
            outputs = _inject_epoch(outputs, epoch)
            _, metrics = objective.loss_and_metrics(outputs, targets)
            return metrics, outputs

        return jax.jit(eval_step)

    def __call__(self, store_outputs: bool = False) -> dict[str, float]:
        if self._eval_fn is None:
            self._eval_fn = self._build_eval()
        self.objective.reset_state()
        self.outputs_list = []
        rng = jax.random.key(self.model.seed + 17)
        epoch = jnp.asarray(self.model.epoch, jnp.float32)
        # uniform replicated placement (no-op when already replicated)
        variables = replicate(self.model.variables, self.mesh)
        # metric scalars stay on device until the end of the pass (same async
        # pipelining rationale as Trainer.train_until); outputs are fetched
        # per batch so stored reconstructions never accumulate in HBM
        pending: list[tuple[dict[str, Array], int]] = []
        for i, (inputs, targets) in enumerate(self.loader.get_loader(inference=True)):
            count = len(jax.tree.leaves(inputs)[0])
            binputs = shard_batch(inputs, self.mesh)
            btargets = shard_batch(targets, self.mesh)
            metrics, outputs = self._eval_fn(
                variables, binputs, btargets, jax.random.fold_in(rng, i), epoch
            )
            pending.append((metrics, count))
            if store_outputs:
                self.outputs_list.append(jax.device_get(outputs))
        for host_metrics, count in jax.device_get(pending):
            self.objective.update_state(host_metrics, count)
        results = self.objective.compute_metrics()
        self._log(results)
        return results

    def _log(self, metrics: dict[str, float]) -> None:
        _dispatch_metrics(self.model.name, self.name, self.model.epoch, metrics)


def _dispatch_metrics(model: str, source: str, epoch: int, metrics: dict[str, float]) -> None:
    """Fan metrics out to the current experiment's trackers (shared by the
    eval runners and the Trainer)."""
    try:
        exp = Experiment.current()
    except RuntimeError:
        return
    for tracker in exp.trackers:
        log = getattr(tracker, 'log_metrics', None)
        if log:
            log(model=model, source=source, epoch=epoch, metrics=metrics)


class Test(_Runner):
    """Evaluation runner with metric aggregation (drytorch ``Test``)."""

    def __init__(self, model: Model, loader: DataLoader, metric: Objective, name: str = 'Test'):
        super().__init__(model, loader, metric, name)

    @property
    def objective_state(self) -> Objective:
        return self.objective


class Diagnostic(_Runner):
    """Eval-mode pass over the training set (drytorch ``Diagnostic``) —
    feeds the codebook-usage hook (src/train/hooks.py:48-57)."""

    def __init__(self, model: Model, loader: DataLoader, objective: Objective, name: str = 'Diagnostic'):
        super().__init__(model, loader, objective, name)


class Trainer:
    """Epoch-loop trainer with validation, hooks and checkpointing."""

    def __init__(
        self,
        model: Model,
        loader: DataLoader,
        loss: Objective,
        learning_schema: LearningSchema,
        frozen: tuple[str, ...] = (),
        mesh: Any | None = None,
    ) -> None:
        self.model = model
        self.loader = loader
        self.objective = loss.copy()
        self.schema = learning_schema
        # top-level params subtrees excluded from optimisation entirely (zero
        # update, zero weight decay) — the reference marks the embedded
        # w_autoencoder requires_grad=False at construction
        # (src/module/autoencoders.py:96-98), so torch's AdamW never visits it;
        # without this mask optax AdamW's decoupled decay would shrink the
        # trained inner CVAE during stage-1 / EMD fine-tune runs.
        self.frozen = tuple(frozen)
        self.mesh = mesh if mesh is not None else get_mesh()
        n = dict(self.mesh.shape).get(mesh_mod.DATA_AXIS, self.mesh.devices.size)
        if loader.batch_size % n:
            if mesh is not None:
                raise ValueError(
                    f'batch_size {loader.batch_size} is not divisible by the '
                    f'{n}-way data axis of the provided mesh'
                )
            # never silently degrade to fully-replicated compute: shard over
            # the largest divisor instead and say so (runtime counterpart of
            # the specs.py batch_size_per_device validator)
            import math

            g = math.gcd(loader.batch_size, n)
            logger.warning(
                'batch_size %d is not divisible by the %d available devices; '
                'training on a %d-device mesh instead',
                loader.batch_size,
                n,
                g,
            )
            self.mesh = get_mesh(g)
        self.post_epoch_hooks = _HookRegistry()
        self.validation: _Runner | None = None
        self.metrics_log: list[dict[str, float]] = []
        self.validation_log: list[dict[str, float]] = []
        self._train_fn = None
        self._state: TrainState | None = None
        self._tx = None

    # ------------------------------------------------------------ plumbing
    def _steps_per_epoch(self) -> int:
        return self.loader.n_batches(inference=False)

    # Subclasses whose parameters carry non-replicated shardings (TPTrainer)
    # set this False: optax.flatten concatenates every leaf into one vector,
    # which under GSPMD would all-gather/re-shard the full parameter set
    # every step.
    flatten_optimizer: bool = True

    def _make_tx(self, flat: bool | None = None) -> optax.GradientTransformation:
        steps = self._steps_per_epoch()
        schema = self.schema

        def lr_schedule(step):
            # epoch-resolution schedule evaluated per optimizer step
            epoch = step // steps
            return schema.base_lr * _traced_schedule(schema.schedule, epoch)

        opt = schema.optimizer_factory(lr_schedule, **schema.opt_settings)
        if flat is None:
            flat = self.flatten_optimizer
        if flat and not self.frozen and os.environ.get('PCCF_FLAT_OPT', '1') != '0':
            # one fused elementwise update over a single contiguous buffer
            # instead of ~350 per-leaf fusions: the optimizer math (AdamW/
            # SGD + uniform weight decay + a shared lr schedule) is
            # leaf-position-independent, so flattening is exact. Kept
            # per-leaf under multi_transform (flatten can't ravel masked
            # subtrees); grad ops stay OUTSIDE the flatten so per-leaf
            # clipper semantics are preserved.
            opt = optax.flatten(opt)
        grad_op = get_grad_op(schema.gradient_op_name, schema.clip_criterion)
        tx = optax.chain(grad_op, opt)
        if self.frozen:
            frozen = set(self.frozen)

            def label_tree(params):
                return {
                    k: jax.tree.map(lambda _: 'frozen' if k in frozen else 'train', v)
                    for k, v in params.items()
                }

            tx = optax.multi_transform(
                {'train': tx, 'frozen': optax.set_to_zero()}, label_tree
            )
        return tx

    def _ensure_state(self) -> TrainState:
        if self._state is None:
            self._tx = self._make_tx()
            params = self.model.params
            opt_state = self._tx.init(params)
            step = self.model.epoch * self._steps_per_epoch()
            if step:
                # resuming from a weights-only checkpoint (no _opt sidecar):
                # the LR schedule is driven by optax's internal count, which
                # tx.init set to 0 — align it with the logical step or the
                # warmup/decay schedule silently restarts from epoch 0
                opt_state = _set_opt_counts(opt_state, step)
            batch_stats = self.model.batch_stats
            state = TrainState(
                params=params,
                batch_stats=batch_stats if batch_stats is not None else {},
                opt_state=opt_state,
                step=jnp.asarray(step, jnp.int32),
            )
            # host round-trip so the (donated) train state never aliases the
            # model's live buffers — device_put to a replicated sharding may
            # reuse the source buffer on its own device, and the first train
            # step would then delete model.variables out from under us
            self._state = replicate(jax.device_get(state), self.mesh)
        return self._state

    def _build_train_step(self, tx: optax.GradientTransformation | None = None):
        module = self.model.module
        objective = self.objective
        tx = self._tx if tx is None else tx
        has_stats = self.model.batch_stats is not None and bool(
            jax.tree.leaves(self.model.batch_stats)
        )
        # non-trained collections (e.g. the frozen codebook constant in the
        # stage-2 W-AE shell) ride along as compile-time constants
        extra = {
            k: v for k, v in self.model.variables.items() if k not in ('params', 'batch_stats')
        }

        def train_step(state: TrainState, inputs, targets, rng, epoch):
            rngs = {'sampling': rng, 'dropout': jax.random.fold_in(rng, 1)}

            def loss_fn(params):
                variables = {'params': params, **extra}
                if has_stats:
                    variables['batch_stats'] = state.batch_stats
                    outputs, updates = module.apply(
                        variables, inputs, train=True, rngs=rngs, mutable=['batch_stats']
                    )
                    new_stats = updates['batch_stats']
                else:
                    outputs = module.apply(variables, inputs, train=True, rngs=rngs)
                    new_stats = state.batch_stats
                outputs = _inject_epoch(outputs, epoch)
                loss, metrics = objective.loss_and_metrics(outputs, targets)
                return loss, (new_stats, metrics)

            (loss, (new_stats, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------- public API
    @property
    def state(self) -> TrainState:
        """Live optimisation state (read-only view; built on first access)."""
        return self._ensure_state()

    def prepare(self) -> None:
        """Build the optimiser state and the jitted sharded train step.

        Idempotent.  Public entry point for single-step driving (the driver's
        ``dryrun_multichip``, tests) — after ``prepare()``, :meth:`run_step`
        executes one optimisation step without touching Trainer internals.
        """
        self._ensure_state()
        if self._train_fn is None:
            self._train_fn = self._build_train_step()

    def run_step(
        self, inputs: Any, targets: Any, rng: Array | None = None, epoch: float | None = None
    ) -> dict[str, float]:
        """Run ONE jitted training step on a host batch; returns host metrics.

        The batch is sharded over the trainer's ``dp`` mesh (strict: the batch
        dim must divide the mesh), the step donates and replaces the live
        optimisation state, and metrics come back as plain floats.
        """
        self.prepare()
        if rng is None:
            rng = jax.random.key(self.model.seed + 1000)
        if epoch is None:
            epoch = float(self.model.epoch + 1)
        binputs = shard_batch(inputs, self.mesh, strict=True)
        btargets = shard_batch(targets, self.mesh, strict=True)
        self._state, metrics = self._train_fn(
            self._state, binputs, btargets, rng, jnp.asarray(epoch, jnp.float32)
        )
        return {k: float(v) for k, v in jax.device_get(metrics).items()}

    # ------------------------------------------------------------- training
    def train_until(self, n_epochs: int) -> None:
        """Train from the model's current epoch up to ``n_epochs``."""
        state = self._ensure_state()
        if self._train_fn is None:
            self._train_fn = self._build_train_step()
        base_rng = jax.random.key(self.model.seed + 1000)
        try:
            for epoch in range(self.model.epoch + 1, n_epochs + 1):
                t0 = time.time()
                epoch_arr = jnp.asarray(epoch, jnp.float32)
                self.objective.reset_state()
                # metrics stay on device during the epoch: fetching them per
                # step would block on each step's completion and defeat async
                # dispatch pipelining; one transfer at epoch end syncs instead
                step_metrics: list[dict[str, Array]] = []
                for i, (inputs, targets) in enumerate(self.loader.epoch_iterator(epoch)):
                    rng = jax.random.fold_in(base_rng, epoch * 100003 + i)
                    binputs = shard_batch(inputs, self.mesh, strict=True)
                    btargets = shard_batch(targets, self.mesh, strict=True)
                    state, metrics = self._train_fn(state, binputs, btargets, rng, epoch_arr)
                    # track the freshest live state every step: the train step
                    # DONATES its input, so a stale self._state (from last
                    # epoch) holds deleted buffers once this epoch's first
                    # step runs — a mid-epoch failure must not sync those
                    # into model.variables (see the finally below)
                    self._state = state
                    step_metrics.append(metrics)
                for host_metrics in jax.device_get(step_metrics):
                    self.objective.update_state(host_metrics, 1)
                self._state = state
                self.model.epoch = epoch
                self._sync_model(state)
                epoch_metrics = self.objective.compute_metrics()
                # the optimizer schedule is step//steps_per_epoch (0-based), so
                # epoch N trains with schedule(N-1) — log the lr actually applied
                epoch_metrics['lr'] = self.schema.lr_at(epoch - 1)
                epoch_metrics['epoch_time_s'] = time.time() - t0
                self.metrics_log.append(epoch_metrics)
                self._check_convergence(epoch_metrics)
                self._log(epoch_metrics, source='Train')
                if self.validation is not None:
                    self.validation.model = self.model
                    val_metrics = self.validation()
                    self.validation_log.append(val_metrics)
                try:
                    self.post_epoch_hooks.run(self)
                except StopTraining:
                    break
        finally:
            if self._state is not None and not any(
                getattr(x, 'is_deleted', lambda: False)()
                for x in jax.tree.leaves(self._state.params)
            ):
                self._sync_model(self._state)

    def _sync_model(self, state: TrainState) -> None:
        variables = {
            k: v for k, v in self.model.variables.items() if k not in ('params', 'batch_stats')
        }
        variables['params'] = state.params
        if state.batch_stats is not None and jax.tree.leaves(state.batch_stats):
            variables['batch_stats'] = state.batch_stats
        elif self.model.batch_stats is not None:
            variables['batch_stats'] = self.model.batch_stats
        self.model.variables = variables

    def _check_convergence(self, metrics: dict[str, float]) -> None:
        loss_name = self.objective.name
        value = metrics.get(loss_name)
        if value is not None and not np.isfinite(value):
            raise ConvergenceError(f'{loss_name} diverged: {value}')

    # ------------------------------------------------------------- features
    def add_validation(self, loader: DataLoader) -> None:
        self.validation = Test(self.model, loader, self.objective, name='Validation')

    def save_checkpoint(self) -> None:
        """Save model weights plus optimiser state for exact resume."""
        self.model.save_state()
        state = self._ensure_state()
        path = (self.model.checkpoint.directory / f'epoch_{self.model.epoch}_opt').resolve()
        from pccf.train.model import shared_checkpointer

        ckptr = shared_checkpointer()
        ckptr.save(
            path,
            {'opt_state': jax.device_get(state.opt_state), 'step': int(state.step)},
            force=True,
        )
        ckptr.wait_until_finished()

    def load_checkpoint(self, checkpoint: int = -1) -> None:
        """Restore model weights and, when present, the optimiser state."""
        self.model.load_state(checkpoint)
        self._state = None
        # the compiled step bakes the optimiser object and the non-trained
        # collections (the `extra` closure in _build_train_step) in as
        # compile-time constants; a restored checkpoint may carry different
        # ones, so force a rebuild on the next step
        self._train_fn = None
        state = self._ensure_state()
        opt_path = (self.model.checkpoint.directory / f'epoch_{self.model.epoch}_opt').resolve()
        if opt_path.exists():
            from pccf.train.model import shared_checkpointer

            ckptr = shared_checkpointer()
            template = {'opt_state': jax.device_get(state.opt_state), 'step': 0}
            payload = ckptr.restore(opt_path, template)
            # place each restored leaf with the layout _ensure_state gave the
            # matching template leaf: replicated for the DP trainer, column-
            # sharded for TPTrainer — a plain replicate() here would silently
            # undo the TP layout on resume (moments are 2x param bytes)
            repl = mesh_mod.replicated(self.mesh)

            def _place(tmpl, val):
                return jax.device_put(val, getattr(tmpl, 'sharding', repl))

            self._state = TrainState(
                params=state.params,
                batch_stats=state.batch_stats,
                opt_state=jax.tree.map(_place, state.opt_state, payload['opt_state']),
                step=jnp.asarray(payload['step'], jnp.int32),
            )

    def update_variables_from(self, variables: dict) -> None:
        """Replace live training params (codebook hook writes).

        Each new leaf is placed with the OLD state leaf's sharding: raw host
        arrays would change the jitted step's input layout (a full recompile
        every hook firing, and a destroyed column-sharded layout under
        TPTrainer)."""
        state = self._ensure_state()
        repl = mesh_mod.replicated(self.mesh)

        def _place(old, new):
            return jax.device_put(np.asarray(jax.device_get(new)), getattr(old, 'sharding', repl))

        new_stats = variables.get('batch_stats', state.batch_stats)
        self._state = TrainState(
            params=jax.tree.map(_place, state.params, variables['params']),
            batch_stats=jax.tree.map(_place, state.batch_stats, new_stats),
            opt_state=state.opt_state,
            step=state.step,
        )
        self.model.variables = variables

    def _log(self, metrics: dict[str, float], source: str) -> None:
        _dispatch_metrics(self.model.name, source, self.model.epoch, metrics)


def _set_opt_counts(opt_state: Any, step: int) -> Any:
    """Set every optax ``count`` field (schedule position, Adam bias
    correction) to ``step`` — used when resuming without an optimiser
    checkpoint so schedules continue from the restored epoch."""

    def walk(node: Any) -> Any:
        if hasattr(node, '_fields'):  # optax states are NamedTuples
            return type(node)(
                **{
                    f: (jnp.asarray(step, jnp.int32) if f == 'count' else walk(getattr(node, f)))
                    for f in node._fields
                }
            )
        if isinstance(node, tuple):
            return type(node)(walk(v) for v in node)
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(opt_state)


def _traced_schedule(schedule: Callable[[float], float], epoch) -> Any:
    """Evaluate a host schedule under trace by tabulating it.

    LR schedules are pure host functions of the epoch; under jit the step
    counter is traced, so we tabulate the schedule over epochs once and index.
    """
    # tabulate 0..4095 epochs (covers every reference config)
    import numpy as _np

    table = jnp.asarray(_np.asarray([schedule(e) for e in range(4096)], dtype=_np.float32))
    return table[jnp.clip(epoch, 0, 4095)]


class _HookRegistry:
    def __init__(self) -> None:
        self._hooks: list[Callable] = []

    def register(self, hook: Callable) -> None:
        self._hooks.append(hook)

    def run(self, trainer: Trainer) -> None:
        for hook in self._hooks:
            hook(trainer)
