"""Composable loss/metric algebra.

Native replacement for the drytorch objective system the reference builds on
(imports at src/train/metrics_and_losses.py:14; composition sites :248-266):

- ``Loss(fn, name)`` wraps a per-sample calculation ``fn(outputs, targets) -> (B,)``.
- ``a + b`` sums losses, ``c * a`` scales (scalar or Loss — the reference
  multiplies an annealing Loss into the KLD), ``a | m`` attaches metrics that
  are logged but not part of the optimised value.
- ``Metric`` adds ``higher_is_better`` and running-state merging
  (``merge_state`` across per-class evaluation suites,
  evaluate_counterfactuals.py:170-179).

All calculations are jit-friendly: they build pure functions of
``(outputs, targets)`` returning per-sample arrays.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = jax.Array
CalcFn = Callable[[Any, Any], Array]


class Objective:
    """Base: named per-sample calculations, one designated loss expression."""

    def __init__(self, calculations: dict[str, CalcFn], loss_expr: '_Expr | None', name: str):
        self.calculations = dict(calculations)
        self.loss_expr = loss_expr
        self.name = name
        # running aggregation state: name -> (sum, count)
        self._state: dict[str, tuple[float, float]] = {}
        self.higher_is_better: dict[str, bool] = {}

    # ----------------------------------------------------------- evaluation
    def compute_all(self, outputs: Any, targets: Any) -> dict[str, Array]:
        """Per-sample value of every named calculation (jit-friendly)."""
        return {name: fn(outputs, targets) for name, fn in self.calculations.items()}

    def loss_value(self, outputs: Any, targets: Any) -> Array:
        """Scalar loss (batch mean of the loss expression)."""
        if self.loss_expr is None:
            raise ValueError(f'{self.name} has no loss component')
        per_sample = self.loss_expr.evaluate(self.compute_all(outputs, targets))
        return jnp.mean(per_sample)

    def loss_and_metrics(self, outputs: Any, targets: Any) -> tuple[Array, dict[str, Array]]:
        values = self.compute_all(outputs, targets)
        metrics = {name: jnp.mean(v) for name, v in values.items()}
        if self.loss_expr is not None:
            loss = jnp.mean(self.loss_expr.evaluate(values))
            metrics[self.name] = loss
        else:
            loss = jnp.zeros(())
        return loss, metrics

    # ---------------------------------------------------------- aggregation
    def update_state(self, metrics: dict[str, Any], count: int = 1) -> None:
        """Accumulate batch-mean metrics into the running state."""
        for name, value in metrics.items():
            s, c = self._state.get(name, (0.0, 0.0))
            self._state[name] = (s + float(value) * count, c + count)

    def reset_state(self) -> None:
        self._state = {}

    def compute_metrics(self) -> dict[str, float]:
        """Aggregated means since the last reset (drytorch ``compute_metrics``)."""
        return {name: s / max(c, 1e-12) for name, (s, c) in self._state.items()}

    def merge_state(self, other: 'Objective') -> None:
        """Merge another objective's running state (weighted by counts)."""
        for name, (s, c) in other._state.items():
            s0, c0 = self._state.get(name, (0.0, 0.0))
            self._state[name] = (s0 + s, c0 + c)

    def copy(self) -> 'Objective':
        new = Objective(self.calculations, self.loss_expr, self.name)
        new._state = dict(self._state)
        new.higher_is_better = dict(self.higher_is_better)
        return new

    # -------------------------------------------------------------- algebra
    @staticmethod
    def _merge_calcs(a: dict, b: dict) -> dict:
        """Merge calculation registries; composing two DIFFERENT functions
        under one name would silently evaluate one of them twice and drop
        the other (``Loss(f1, 'x') + Loss(f2, 'x')`` -> mean(2*f2)).

        Fresh closures from the same factory (``loss | get_emd_loss()``
        where the loss already holds an 'EMD' term — train_autoencoder's
        FinalTest under ChamferEMD) are the same calculation by
        module+qualname AND captured constants: two closures from one
        factory with different captures (``get_annealing(cfg_a)`` vs
        ``get_annealing(cfg_b)``) are different calculations, and merging
        them would silently apply one schedule to both terms."""

        def cells_equal(f, g):
            cf = getattr(f, '__closure__', None) or ()
            cg = getattr(g, '__closure__', None) or ()
            if len(cf) != len(cg):
                return False
            for x, y in zip(cf, cg):
                a_, b_ = x.cell_contents, y.cell_contents
                if a_ is b_:
                    continue
                try:
                    if bool(a_ == b_):
                        continue
                except Exception:
                    return False  # incomparable captures: assume different
                return False
            return True

        def same(f, g):
            if f is g:
                return True
            qf = getattr(f, '__qualname__', None)
            return (
                qf is not None
                and qf == getattr(g, '__qualname__', None)
                and getattr(f, '__module__', None) == getattr(g, '__module__', None)
                and cells_equal(f, g)
            )

        for name in a.keys() & b.keys():
            if not same(a[name], b[name]):
                raise ValueError(
                    f'objective name collision: {name!r} is bound to two '
                    f'different calculations; rename one term'
                )
        return {**a, **b}

    def __add__(self, other: 'Objective') -> 'Objective':
        calcs = self._merge_calcs(self.calculations, other.calculations)
        expr = _Add(self._expr(), other._expr())
        new = Objective(calcs, expr, 'Loss')
        new.higher_is_better = {**self.higher_is_better, **other.higher_is_better}
        return new

    def __mul__(self, other: 'Objective | float | int') -> 'Objective':
        if isinstance(other, Objective):
            calcs = self._merge_calcs(self.calculations, other.calculations)
            expr = _Mul(self._expr(), other._expr())
            new = Objective(calcs, expr, 'Loss')
            new.higher_is_better = {**self.higher_is_better, **other.higher_is_better}
            return new
        new = Objective(self.calculations, _Scale(self._expr(), float(other)), self.name)
        new.higher_is_better = dict(self.higher_is_better)
        return new

    __rmul__ = __mul__

    def __or__(self, metric: 'Objective') -> 'Objective':
        """Attach metric calculations without changing the loss."""
        calcs = self._merge_calcs(self.calculations, metric.calculations)
        new = Objective(calcs, self.loss_expr, self.name)
        new.higher_is_better = {**self.higher_is_better, **metric.higher_is_better}
        return new

    def _expr(self) -> '_Expr':
        if self.loss_expr is None:
            raise ValueError(f'{self.name} is metric-only; cannot join into a loss')
        return self.loss_expr


class Loss(Objective):
    """A named loss term (per-sample calculation that is optimised)."""

    def __init__(self, fn: CalcFn, name: str):
        super().__init__({name: fn}, _Leaf(name), name)


class Metric(Objective):
    """A named metric (logged, never optimised)."""

    def __init__(self, fn: CalcFn, name: str, higher_is_better: bool = False):
        super().__init__({name: fn}, None, name)
        self.higher_is_better = {name: higher_is_better}


def compute_metrics(obj: Objective) -> dict[str, float]:
    """Aggregated metric values (drytorch API parity)."""
    return obj.compute_metrics()


# ---------------------------------------------------------------- expressions


class _Expr:
    def evaluate(self, values: dict[str, Array]) -> Array:  # pragma: no cover
        raise NotImplementedError

    def leaf_names(self) -> list[str]:  # pragma: no cover
        raise NotImplementedError


class _Leaf(_Expr):
    def __init__(self, name: str):
        self.name = name

    def evaluate(self, values):
        return values[self.name]

    def leaf_names(self):
        return [self.name]


class _Add(_Expr):
    def __init__(self, a: _Expr, b: _Expr):
        self.a, self.b = a, b

    def evaluate(self, values):
        return self.a.evaluate(values) + self.b.evaluate(values)

    def leaf_names(self):
        return self.a.leaf_names() + self.b.leaf_names()


class _Mul(_Expr):
    def __init__(self, a: _Expr, b: _Expr):
        self.a, self.b = a, b

    def evaluate(self, values):
        return self.a.evaluate(values) * self.b.evaluate(values)

    def leaf_names(self):
        return self.a.leaf_names() + self.b.leaf_names()


class _Scale(_Expr):
    def __init__(self, a: _Expr, s: float):
        self.a, self.s = a, s

    def evaluate(self, values):
        return self.s * self.a.evaluate(values)

    def leaf_names(self):
        return self.a.leaf_names()
