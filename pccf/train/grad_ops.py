"""Gradient operations as optax transforms.

Native re-implementation of the drytorch gradient-op registry consumed by the
reference (src/train/learning_schema.py:29-50): normalizers, value/norm
clippers, and history-based clippers with ZStat / EMA criteria.  All state is
carried in jit-friendly arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def grad_param_normalizer() -> optax.GradientTransformation:
    """Normalise each parameter's gradient to unit L2 norm."""

    def update(updates, state, params=None):
        del params

        def norm(g):
            n = jnp.sqrt(jnp.sum(g * g))
            return g / jnp.maximum(n, 1e-12)

        return jax.tree.map(norm, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def grad_zscore_normalizer() -> optax.GradientTransformation:
    """Z-score normalise each parameter's gradient (zero mean, unit std)."""

    def update(updates, state, params=None):
        del params

        def z(g):
            mu = jnp.mean(g)
            sd = jnp.std(g)
            return (g - mu) / jnp.maximum(sd, 1e-12)

        return jax.tree.map(z, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def grad_value_clipper(max_value: float = 1.0) -> optax.GradientTransformation:
    return optax.clip(max_value)


def grad_norm_clipper(max_norm: float = 1.0) -> optax.GradientTransformation:
    return optax.clip_by_global_norm(max_norm)


class _HistState(NamedTuple):
    mean: Array  # running mean of the (log) norm
    var: Array  # running variance
    # deliberately NOT named 'count': runners._set_opt_counts rewrites every
    # optax field of that name to the restored step on a weights-only resume,
    # which here would fake a populated history (mean/var still zero) and
    # zero every gradient via a threshold of 0 — history must restart instead
    seen: Array


def _criterion_threshold(criterion: str, mean: Array, var: Array) -> Array:
    """Clipping threshold from running statistics of past gradient norms.

    - ``ZStat``: mean + 2 std (clip norms that are statistical outliers).
    - ``EMA``: 1.5x the exponential moving average.
    """
    if criterion == 'ZStat':
        return mean + 2.0 * jnp.sqrt(jnp.maximum(var, 0.0))
    return 1.5 * mean


def hist_clipper(criterion: str = 'ZStat', decay: float = 0.9) -> optax.GradientTransformation:
    """Clip the global gradient norm against a running-history threshold."""

    def init(params):
        del params
        return _HistState(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))

    def update(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        first = state.seen == 0
        # threshold against the PRIOR history (an outlier must not raise the
        # bar it is judged by), then fold the clipped norm into the stats.
        # threshold > 0 guards the degenerate pinned-at-zero history (first
        # norm exactly 0): clipping against 0 would zero every later gradient
        # AND keep the stats at 0 forever
        threshold = _criterion_threshold(criterion, state.mean, state.var)
        clip = (norm > threshold) & jnp.logical_not(first) & (threshold > 0)
        scale = jnp.where(clip, threshold / jnp.maximum(norm, 1e-12), 1.0)
        updates = jax.tree.map(lambda g: g * scale, updates)
        eff_norm = jnp.where(clip, threshold, norm)
        new_mean = jnp.where(first, norm, decay * state.mean + (1 - decay) * eff_norm)
        delta = eff_norm - new_mean
        new_var = jnp.where(first, 0.0, decay * state.var + (1 - decay) * delta * delta)
        return updates, _HistState(new_mean, new_var, state.seen + 1)

    return optax.GradientTransformation(init, update)


class _ParamHistState(NamedTuple):
    mean: optax.Updates
    var: optax.Updates
    seen: Array  # not 'count' — see _HistState


def param_hist_clipper(criterion: str = 'EMA', decay: float = 0.9) -> optax.GradientTransformation:
    """Per-parameter history clipping (the reference's W-AE default,
    w_autoencoder/train/learn/default_learn.yaml: ParamHistClipper + EMA)."""

    def init(params):
        zeros = jax.tree.map(lambda p: jnp.zeros(()), params)
        return _ParamHistState(zeros, jax.tree.map(lambda p: jnp.zeros(()), params), jnp.zeros(()))

    def update(updates, state, params=None):
        del params
        first = state.seen == 0

        def upd(g, m, v):
            norm = jnp.sqrt(jnp.sum(g * g))
            threshold = _criterion_threshold(criterion, m, v)
            clip = (norm > threshold) & jnp.logical_not(first) & (threshold > 0)
            scale = jnp.where(clip, threshold / jnp.maximum(norm, 1e-12), 1.0)
            eff_norm = jnp.where(clip, threshold, norm)
            new_m = jnp.where(first, norm, decay * m + (1 - decay) * eff_norm)
            delta = eff_norm - new_m
            new_v = jnp.where(first, 0.0, decay * v + (1 - decay) * delta * delta)
            return g * scale, new_m, new_v

        flat_g, tree = jax.tree.flatten(updates)
        flat_m = jax.tree.leaves(state.mean)
        flat_v = jax.tree.leaves(state.var)
        out = [upd(g, m, v) for g, m, v in zip(flat_g, flat_m, flat_v)]
        new_updates = tree.unflatten([o[0] for o in out])
        new_mean = tree.unflatten([o[1] for o in out])
        new_var = tree.unflatten([o[2] for o in out])
        return new_updates, _ParamHistState(new_mean, new_var, state.seen + 1)

    return optax.GradientTransformation(init, update)


def get_grad_op(name: str | None, criterion: str = 'ZStat') -> optax.GradientTransformation:
    """Registry lookup (reference learning_schema.py:29-50)."""
    if name is None:
        return optax.identity()
    registry = {
        'GradParamNormalizer': lambda: grad_param_normalizer(),
        'GradZScoreNormalizer': lambda: grad_zscore_normalizer(),
        'GradValueClipper': lambda: grad_value_clipper(),
        'GradNormClipper': lambda: grad_norm_clipper(),
        'HistClipper': lambda: hist_clipper(criterion),
        'ParamHistClipper': lambda: param_hist_clipper(criterion),
    }
    if name not in registry:
        # every GradOp enum member is covered above, so an unknown name is
        # always a caller mistake — silently disabling clipping would hide it
        raise ValueError(f'unknown gradient op {name!r}; expected one of {sorted(registry)}')
    return registry[name]()
