"""Sharded-point-axis (SP) geometry losses over a device mesh.

The blockwise loss kernels operate per batch element on an (N, M) distance
structure; at large point counts that quadratic term dominates memory.  These
wrappers shard the *point* axis across a mesh axis with ``shard_map`` so each
device holds only an ``(N/sp, M)`` slab, with XLA collectives carrying the
cross-shard terms:

- :func:`sp_chamfer` — one tiled ``all_gather`` of the opposing cloud
  (activations are only ``M x 3``), local row minima, and a ``psum`` per
  direction.  Fully differentiable through the min (same gradient as the
  reference's gather formulation away from ties).
- :func:`sp_match_cost` — ApproxMatch EMD (reference approxmatch.cu
  semantics, see ``ops.approx_match``) with row state (``remain_l``,
  ``ratio_l``, the match rows) kept shard-local; the only cross-shard
  quantity is the per-level column demand, one ``(B, M)`` ``psum`` per
  relaxation level.  Backward treats the plan as constant (the reference
  ``match_cost`` contract).
- :func:`sp_knn` — self-kNN of a sharded cloud: gather candidates, local
  ``top_k`` per centre shard.

These mirror the single-device goldens in :mod:`pccf.kernels.ops` exactly
(tests assert value + gradient equality on a virtual mesh).  Within each
shard, :func:`sp_chamfer` dispatches the fused Pallas NN kernel through
``kernels.api`` (the (n_loc, M) distance slab stays in VMEM on TPU);
:func:`sp_match_cost` and :func:`sp_knn` run the golden math per shard by
design, not as a stopgap: the ApproxMatch recursion needs one cross-shard
``psum`` (the column demand) *per relaxation level*, and a pallas_call
cannot host collectives mid-launch — the single-chip kernel's big wins
(phase fusion across levels, one deferred gradient matmul) are exactly the
fusions the per-level collective contract forbids.  What remains per level
is three ``einsum`` sweeps that XLA already lowers to MXU matmuls; the
reachable Pallas gain per shard is d2 VMEM-residency only.  ``sp_knn``'s
``top_k`` similarly lacks the self-shortcut structure the packed-key
tournament kernel exploits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pccf.kernels import ops

Array = jax.Array


def _check_points(n: int, mesh: Mesh, axis: str) -> int:
    sp = mesh.shape[axis]
    if n % sp:
        raise ValueError(f'point count {n} not divisible by mesh axis {axis!r} size {sp}')
    return sp


def sp_chamfer(
    x: Array,
    y: Array,
    mesh: Mesh,
    axis: str = 'mp',
    batch_axis: str | None = None,
    reduction: str = 'mean',
) -> Array:
    """Chamfer distance ``(B,)`` with both clouds sharded on the point axis.

    Same semantics as :func:`pccf.kernels.ops.chamfer` (reference
    metrics_and_losses.py:21-47); differentiable.
    """
    n, m = x.shape[1], y.shape[1]
    sp = _check_points(n, mesh, axis)
    _check_points(m, mesh, axis)
    m_loc = m // sp
    spec = P(batch_axis, axis, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=P(batch_axis),
    )
    def f(xl: Array, yl: Array) -> Array:
        from pccf.kernels import api as kapi

        yg = jax.lax.all_gather(yl, axis, axis=1, tiled=True)  # (B, M, C)
        # within-shard compute dispatches the fused Pallas NN kernel on TPU
        # (VMEM distance scan — the (n_loc, M) slab never hits HBM).  The
        # kernel has no AD rule, so it runs under stop_gradient for the
        # *indices* only; the distances are then re-expressed as gathers,
        # which gives the exact gradient of min (envelope theorem: the
        # argmin is locally constant), matching ops.chamfer's gradient.
        _, i1, _, i2 = kapi.nn_distance(
            jax.lax.stop_gradient(xl), jax.lax.stop_gradient(yg)
        )
        dist1 = jnp.sum(
            jnp.square(xl - jnp.take_along_axis(yg, i1[..., None], axis=1)), axis=-1
        )  # (B, n_loc): complete (all of y present)
        part2 = jnp.sum(
            jnp.square(yg - jnp.take_along_axis(xl, i2[..., None], axis=1)), axis=-1
        )  # (B, M): this shard's partial minima over its x rows for ALL of y
        fwd = jax.lax.psum(jnp.sum(dist1, axis=1), axis)
        # the global min lands back on the shard that owns those y rows
        parts = jax.lax.all_gather(part2, axis, axis=0, tiled=False)  # (sp, B, M)
        row = jax.lax.axis_index(axis) * m_loc
        dist2 = jnp.min(jax.lax.dynamic_slice_in_dim(parts, row, m_loc, axis=2), axis=0)
        bwd = jax.lax.psum(jnp.sum(dist2, axis=1), axis)
        if reduction == 'mean':
            return fwd / n + bwd / m
        return fwd + bwd

    return f(x, y)


def sp_knn(
    x: Array,
    k: int,
    mesh: Mesh,
    axis: str = 'mp',
    batch_axis: str | None = None,
) -> Array:
    """Self-kNN indices ``(B, N, k)`` of a point-axis-sharded cloud.

    Matches :func:`pccf.kernels.ops.knn` (global indices into axis 1; the
    output rides the same sharding as the input rows).
    """
    _check_points(x.shape[1], mesh, axis)
    spec = P(batch_axis, axis, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
    )
    def f(xl: Array) -> Array:
        xg = jax.lax.all_gather(xl, axis, axis=1, tiled=True)  # (B, N, C)
        d = ops.square_distance(xl, xg)
        _, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32)

    return f(jax.lax.stop_gradient(x))


@functools.lru_cache(maxsize=8)  # bounded: Mesh objects pin device refs; match get_mesh
def _make_sp_match_cost(mesh: Mesh, axis: str, batch_axis: str | None):
    spec = P(batch_axis, axis, None)

    def _fwd_grads(x1: Array, x2: Array):
        """cost (B,), grad1 sharded rows, grad2 (replicated across ``axis``)."""
        n, m = x1.shape[1], x2.shape[1]
        mult_l, mult_r = ops.emd_marginal_multipliers(n, m)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(P(batch_axis), spec, P(batch_axis, None, None)),
        )
        def f(x1l: Array, x2l: Array):
            b, n_loc = x1l.shape[0], x1l.shape[1]
            x2g = jax.lax.all_gather(x2l, axis, axis=1, tiled=True)  # (B, M, C)
            d = ops.square_distance(x1l, x2g)  # (B, n_loc, M)

            def level_step(carry, level):
                remain_l, remain_r, match = carry
                kernel = jnp.exp(level * d)
                suml = jnp.einsum('bnm,bm->bn', kernel, remain_r) + 1e-9
                ratio_l = remain_l / suml  # shard-local rows
                demand = (
                    jax.lax.psum(jnp.einsum('bnm,bn->bm', kernel, ratio_l), axis)
                    * remain_r
                )
                consumption = jnp.minimum(remain_r / (demand + 1e-9), 1.0)
                ratio_r = consumption * remain_r
                w = kernel * ratio_l[:, :, None] * ratio_r[:, None, :]
                match = match + w
                remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
                remain_r = jnp.maximum(0.0, remain_r - demand)
                return (remain_l, remain_r, match), None

            # row state varies across the shard axis (it will depend on the
            # local distance slab) and, when the batch is sharded, across the
            # batch axis too; mark the initial carry accordingly for the
            # scan's varying-manual-axes typing
            row_axes = (axis,) + ((batch_axis,) if batch_axis else ())
            col_axes = (batch_axis,) if batch_axis else ()

            def varying(v, axes):
                return jax.lax.pcast(v, axes, to='varying') if axes else v

            init = (
                varying(jnp.full((b, n_loc), mult_l, dtype=x1l.dtype), row_axes),
                varying(jnp.full((b, m), mult_r, dtype=x1l.dtype), col_axes),
                varying(jnp.zeros((b, n_loc, m), dtype=x1l.dtype), row_axes),
            )
            levels = jnp.asarray(ops.APPROX_MATCH_LEVELS, dtype=x1l.dtype)
            (_, _, match), _ = jax.lax.scan(level_step, init, levels)

            dist = jnp.sqrt(jnp.maximum(d, 0.0))
            cost = jax.lax.psum(jnp.sum(match * dist, axis=(1, 2)), axis)
            # match-constant grads (approxmatch.cu:229-312 semantics)
            diff = x1l[:, :, None, :] - x2g[:, None, :, :]  # (B, n_loc, M, 3)
            inv = jax.lax.rsqrt(jnp.maximum(d, 1e-20))
            w = match * inv
            grad1 = jnp.einsum('bnm,bnmc->bnc', w, diff)
            grad2 = jax.lax.psum(-jnp.einsum('bnm,bnmc->bmc', w, diff), axis)
            return cost, grad1, grad2

        return f(x1, x2)

    @jax.custom_vjp
    def cost_fn(x1: Array, x2: Array) -> Array:
        cost, _, _ = _fwd_grads(x1, x2)
        return cost

    def fwd(x1, x2):
        cost, grad1, grad2 = _fwd_grads(x1, x2)
        return cost, (grad1, grad2)

    def bwd(res, g):
        grad1, grad2 = res
        g = g[:, None, None]
        return grad1 * g, grad2 * g

    cost_fn.defvjp(fwd, bwd)
    return cost_fn


def sp_match_cost(
    x1: Array,
    x2: Array,
    mesh: Mesh,
    axis: str = 'mp',
    batch_axis: str | None = None,
) -> Array:
    """ApproxMatch EMD ``(B,)`` with the point axis sharded over ``axis``.

    Value and match-constant gradients equal to
    :func:`pccf.kernels.ops.match_cost`; per-device memory for the transport
    plan drops from ``N x M`` to ``N/sp x M``.
    """
    _check_points(x1.shape[1], mesh, axis)
    _check_points(x2.shape[1], mesh, axis)
    return _make_sp_match_cost(mesh, axis, batch_axis)(x1, x2)
