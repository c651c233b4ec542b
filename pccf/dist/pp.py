"""GPipe-style pipeline parallelism for uniform layer stacks.

The inner-CVAE transformers are stacks of identical pre-norm layers
(``pccf/nn/w_networks.py``); this module pipelines such a stack over a
``pp`` mesh axis the TPU-native way:

- per-layer parameters are stacked on a leading layer axis and sharded over
  ``pp`` (each stage holds ``n_layers / pp_size`` consecutive layers),
- the batch is split into microbatches; at every schedule tick each stage
  applies its layer block to the microbatch it holds and passes the
  activation to the next stage with one ``ppermute`` hop over ICI,
- the last stage's outputs are collected and replicated with a ``psum``.

The schedule is the classic GPipe fill-drain: ``n_micro + pp_size - 1``
ticks, bubble fraction ``(pp_size - 1) / (n_micro + pp_size - 1)``.  The
whole pipeline is differentiable (``ppermute``/``scan`` transpose cleanly),
so stage-sharded *training* works: layer gradients come out sharded on the
layer axis exactly like the parameters.

No reference counterpart (the reference is DP-only, SURVEY §2.7): this is
part of pccf's beyond-parity parallel layer (see also tp in
``pccf/dist/sharding.py``, sp in ``pccf/dist/sp.py``, ep component sharding).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def stack_layer_params(layer_params: list[Any]) -> Any:
    """Stack per-layer parameter subtrees on a new leading layer axis.

    Layers whose dense widths differ (e.g. ``mlp_dims=[1024, 512]``) are
    zero-padded up to the elementwise-max shape first — padding columns of a
    dense kernel (with zero bias) and the matching rows of the next kernel is
    math-identical for activations with ``act(0) == 0``, the same packing the
    fused transformer-stack kernel uses (pallas_wformer.pack_*_params).
    """
    trees = [jax.tree.leaves(p) for p in layer_params]
    structs = [jax.tree.structure(p) for p in layer_params]
    if any(s != structs[0] for s in structs):
        raise ValueError('layer parameter trees differ in structure')
    maxshape = [
        tuple(max(t[i].shape[d] for t in trees) for d in range(t0.ndim))
        for i, t0 in enumerate(trees[0])
    ]

    def pad(leaf, shape):
        return jnp.pad(leaf, [(0, t - s) for s, t in zip(leaf.shape, shape, strict=True)])

    stacked = [
        jnp.stack([pad(t[i], maxshape[i]) for t in trees]) for i in range(len(trees[0]))
    ]
    return jax.tree.unflatten(structs[0], stacked)


def shard_stacked_params(stacked: Any, mesh: Mesh, axis: str = 'pp') -> Any:
    """Device-put a stacked layer tree with the layer axis over ``axis``."""
    return jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P(axis))), stacked
    )


def pipeline_apply(
    layer_fn: Callable,
    stacked_params: Any,
    x: Array,
    mesh: Mesh,
    axis: str = 'pp',
    n_micro: int | None = None,
    extra: Array | None = None,
) -> Array:
    """Apply a stacked layer sequence to ``x`` as a microbatched pipeline.

    Args:
        layer_fn: ``layer_fn(params_slice, h[, extra]) -> h`` applying ONE
            layer (pure; e.g. a bound ``module.apply``).
        stacked_params: pytree with a leading layer axis (from
            :func:`stack_layer_params`), sharded or shardable over ``axis``.
        x: ``(B, ...)`` activations (replicated).
        n_micro: microbatch count (divides B; default = pipeline depth).
        extra: optional replicated side input passed to every layer (e.g.
            cross-attention memory).

    Returns:
        ``(B, ...)`` outputs, replicated over ``axis``.
    """
    s = int(mesh.shape[axis])
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % s:
        raise ValueError(f'{n_layers} layers not divisible by {axis!r} size {s}')
    b = x.shape[0]
    m = n_micro if n_micro is not None else s
    if b % m:
        raise ValueError(f'batch {b} not divisible by n_micro {m}')
    has_extra = extra is not None
    in_specs = (P(axis), P()) + ((P(),) if has_extra else ())

    def run(params_local, xg, *rest):
        idx = jax.lax.axis_index(axis)
        mb = xg.reshape(m, b // m, *xg.shape[1:])
        # the side input rides with its microbatch: stage d processes
        # microbatch (t - d) at tick t, so index it per stage per tick
        extra_mb = (
            rest[0].reshape(m, b // m, *rest[0].shape[1:]) if has_extra else None
        )

        def block(h, e):
            def body(h, p):
                out = layer_fn(p, h, e) if has_extra else layer_fn(p, h)
                return out, None

            h, _ = jax.lax.scan(body, h, params_local)
            return h

        act0 = jax.lax.pcast(jnp.zeros_like(mb[0]), (axis,), to='varying')
        outs0 = jax.lax.pcast(jnp.zeros_like(mb), (axis,), to='varying')

        def step(carry, t):
            act, outs = carry
            feed = jax.lax.dynamic_index_in_dim(mb, jnp.minimum(t, m - 1), 0, keepdims=False)
            h = jnp.where(idx == 0, feed, act)
            e = (
                jax.lax.dynamic_index_in_dim(
                    extra_mb, jnp.clip(t - idx, 0, m - 1), 0, keepdims=False
                )
                if has_extra
                else None
            )
            y = block(h, e)
            out_t = jnp.maximum(t - (s - 1), 0)
            collect = (idx == s - 1) & (t >= s - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, out_t, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(collect, y, prev), out_t, 0
            )
            act = jax.lax.ppermute(y, axis, [(i, i + 1) for i in range(s - 1)])
            return (act, outs), None

        (_, outs), _ = jax.lax.scan(step, (act0, outs0), jnp.arange(m + s - 1))
        # Collection: finished microbatches live on stage s-1 only; the
        # masked psum is the SPMD "located -> replicated" idiom (XLA lowers
        # it to a ring all-reduce, ~2x the buffer bytes).  SPMD cannot keep
        # the outs carry smaller on the other stages (one program runs
        # everywhere), and at inner-CVAE sizes (~2 MB/batch) the collective
        # is ~µs — not worth a hand-rolled multi-hop broadcast.
        outs = jax.lax.psum(jnp.where(idx == s - 1, outs, jnp.zeros_like(outs)), axis)
        return outs.reshape(b, *xg.shape[1:])

    args = (stacked_params, x) + ((extra,) if has_extra else ())
    return shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=P())(*args)
