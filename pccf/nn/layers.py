"""Layer library (flax.linen, channels-last).

JAX counterpart of the reference layer library (src/module/layers.py).  All
1x1 "convolutions" are plain feature-axis matmuls (``DenseBlock``), which is
the TPU-idiomatic form: the feature axis lands on the 128-lane dimension and
the matmul on the MXU.  One block type covers the reference's
``LinearLayer`` / ``PointsConvLayer`` / ``EdgeConvLayer`` (rank 2/3/4 inputs).

Initialisation policy mirrors ``GeneralizedLinearLayer.get_init``
(layers.py:130-149): kaiming-uniform for (leaky-)ReLU, xavier-normal for
linear/tanh heads, gain-0.01 xavier for ``soft_init`` heads.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Act = Callable[[Array], Array]


def bn_groups() -> int:
    """BatchNorm statistic groups (env ``PCCF_BN_GROUPS``, trace-time).

    1 (default): statistics over the global batch — GSPMD semantics, the
    better estimator at the small per-device batches all configs here use.
    G>1: statistics per contiguous batch-group of B/G samples — exactly the
    reference's unsynced-DDP per-replica BatchNorm with G replicas
    (reference src/utils/parallel.py:17-66 wraps DDP without SyncBatchNorm).
    With the batch dp-sharded over G devices, groups coincide with shards, so
    XLA computes the stats shard-locally with NO cross-device collective.
    The measured quality effect of this deviation is recorded in PARITY.md
    ("Known deviations").
    """
    return max(1, int(os.environ.get('PCCF_BN_GROUPS', '1')))


class GroupedBatchNorm(nn.Module):
    """BatchNorm whose training statistics are computed per batch-group.

    Group g normalises with the mean/var of samples [g*B/G, (g+1)*B/G) —
    the per-replica semantics of the reference's DDP default.  Running
    statistics are updated with the across-group mean of the group moments
    (the replicas' running buffers converge to the same thing in
    expectation; rank 0's buffer is what the reference checkpoints).
    Variable names mirror ``nn.BatchNorm`` ('scale'/'bias' params,
    batch_stats 'mean'/'var'), so checkpoints are interchangeable with the
    G=1 path.
    """

    groups: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool) -> Array:
        feat = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (feat,))
        bias = self.param('bias', nn.initializers.zeros, (feat,))
        ra_mean = self.variable('batch_stats', 'mean', jnp.zeros, (feat,))
        ra_var = self.variable('batch_stats', 'var', jnp.ones, (feat,))
        if use_running_average:
            a = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return x * a + (bias - ra_mean.value * a)
        g = self.groups
        if x.shape[0] % g:
            raise ValueError(f'batch {x.shape[0]} not divisible by bn groups {g}')
        xg = x.reshape(g, x.shape[0] // g, *x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))
        mean = jnp.mean(xg, axis=axes)  # (G, F)
        var = jnp.mean(jnp.square(xg), axis=axes) - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mean.mean(0)
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var.mean(0)
            )
        shape = (g, 1) + (1,) * (xg.ndim - 3) + (feat,)
        a = scale * jax.lax.rsqrt(var.reshape(shape) + self.epsilon)
        y = xg * a + (bias - mean.reshape(shape) * a)
        return y.reshape(x.shape)


def default_act(x: Array) -> Array:
    """LeakyReLU(0.2) — the reference DEFAULT_ACT (src/config/torch.py)."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def gelu_exact(x: Array) -> Array:
    """Exact-erf GELU (torch.nn.GELU default) — shared callable so fused
    fast paths can identity-check the configured activation."""
    return jax.nn.gelu(x, approximate=False)


def get_kernel_init(act_name: str, soft_init: bool = False) -> nn.initializers.Initializer:
    """Activation-dependent kernel init (reference layers.py:130-149)."""
    if soft_init:
        # xavier_normal gain=0.01 -> variance scale gain^2
        return nn.initializers.variance_scaling(0.01**2, 'fan_avg', 'truncated_normal')
    if act_name in ('', 'LeakyReLU'):
        # kaiming_uniform with a=0.2: scale = 2 / (1 + a^2)
        return nn.initializers.variance_scaling(2.0 / (1.0 + 0.2**2), 'fan_in', 'uniform')
    if act_name == 'ReLU':
        return nn.initializers.variance_scaling(2.0, 'fan_in', 'uniform')
    if act_name in ('Hardtanh', 'Tanh'):
        # xavier_normal with tanh gain 5/3
        return nn.initializers.variance_scaling((5.0 / 3.0) ** 2, 'fan_avg', 'truncated_normal')
    if act_name == 'linear':
        return nn.initializers.variance_scaling(1.0, 'fan_avg', 'truncated_normal')
    return nn.initializers.lecun_normal()


class DenseBlock(nn.Module):
    """dense (feature-axis matmul) + optional BatchNorm + activation + residual.

    Args:
        features: output feature count.
        act: activation callable or None.
        act_name: name used only for init selection (matches reference policy).
        batch_norm: include BatchNorm over all non-feature axes (per-replica
            statistics, matching DDP-default unsynced BN).
        groups: grouped dense (input and output features split into groups).
        residual: add input (repeat-interleaved to width) to the output
            (reference layers.py:165-167).
        soft_init: gain-0.01 xavier init for output heads.
    """

    features: int
    act: Act | None = None
    act_name: str = ''
    batch_norm: bool = True
    groups: int = 1
    residual: bool = False
    soft_init: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        init = get_kernel_init(self.act_name if self.act is not None else 'linear', self.soft_init)
        use_bias = not self.batch_norm
        in_features = x.shape[-1]
        if self.groups == 1:
            y = nn.Dense(self.features, use_bias=use_bias, kernel_init=init, name='dense')(x)
        else:
            if in_features % self.groups or self.features % self.groups:
                raise ValueError('features not divisible by groups')
            gin = in_features // self.groups
            gout = self.features // self.groups

            def grouped_init(key, shape, dtype=jnp.float32):
                # per-group fan: variance_scaling on the full (groups, gin,
                # gout) shape would count the leading groups dim as receptive
                # field (fan_in = groups*gin, std a factor sqrt(groups) too
                # small), while torch's grouped conv — the reference init
                # policy — uses fan_in = gin. Draw each group independently.
                g, *group_shape = shape
                keys = jax.random.split(key, g)
                return jnp.stack([init(k, tuple(group_shape), dtype) for k in keys])

            kernel = self.param('grouped_kernel', grouped_init, (self.groups, gin, gout))
            xg = x.reshape(*x.shape[:-1], self.groups, gin)
            y = jnp.einsum('...gi,gio->...go', xg, kernel)
            if use_bias:
                bias = self.param('grouped_bias', nn.initializers.zeros, (self.groups, gout))
                y = y + bias
            y = y.reshape(*x.shape[:-1], self.features)
        if self.batch_norm:
            # torch momentum 0.1 == flax momentum 0.9; normalise feature axis
            g = bn_groups()
            if g > 1:
                # per-replica statistics (reference DDP semantics); same
                # variable tree as nn.BatchNorm -> checkpoint-compatible
                y = GroupedBatchNorm(groups=g, name='bn')(y, not train)
            else:
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5, name='bn'
                )(y)
        if self.act is not None:
            y = self.act(y)
        if self.residual:
            # channel-interleaved residual (reference layers.py:165-166);
            # shared with the fused PCGen kernel, whose layer-0 residual must
            # reproduce this layout exactly
            from pccf.kernels.ops import interleave_residual

            y = y + interleave_residual(x, self.features)
        return y


def temperature_softmax(x: Array, temperature: float, axis: int = -1) -> Array:
    """Softmax of ``x / T`` (reference TemperatureScaledSoftmax, layers.py:206)."""
    return jax.nn.softmax(x / temperature, axis=axis)


def gumbel_softmax(rng: Array, logits: Array, tau: float, axis: int = -1) -> Array:
    """Gumbel-softmax sample (matches torch.nn.functional.gumbel_softmax, soft)."""
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape, minval=1e-20) + 1e-20) + 1e-20)
    return jax.nn.softmax((logits + gumbel) / tau, axis=axis)


class MLPHead(nn.Module):
    """Dense stack with optional dropout between layers (classifier head).

    Parity note: like the reference (classifier.py:40-44, which zips
    ``pairwise(mlp_dims)`` with the rates, strict=False), only the first
    ``len(dims) - 1`` dropout rates are consumed — there is deliberately no
    dropout between the last hidden layer and the logits, even though the
    configs list one rate per hidden layer."""

    dims: tuple[int, ...]
    out_features: int
    act: Act
    act_name: str = ''
    dropout_rates: tuple[float, ...] = ()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = DenseBlock(self.dims[0], act=self.act, act_name=self.act_name)(x, train)
        rates = list(self.dropout_rates) + [0.0] * len(self.dims)
        for i in range(1, len(self.dims)):
            x = nn.Dropout(rate=rates[i - 1], deterministic=not train)(x)
            x = DenseBlock(self.dims[i], act=self.act, act_name=self.act_name)(x, train)
        return DenseBlock(self.out_features, act=None, batch_norm=False)(x, train)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (torch ``norm_first=True`` semantics)."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    act: Act

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
        )(h, h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_ff)(h)
        h = self.act(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class TransformerDecoderLayer(nn.Module):
    """Pre-norm transformer decoder layer with cross-attention memory."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    act: Act

    @nn.compact
    def __call__(self, x: Array, memory: Array, train: bool = False) -> Array:
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
        )(h, h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
        )(h, memory)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_ff)(h)
        h = self.act(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h
