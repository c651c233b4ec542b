"""Sharded-point-axis losses: value + gradient equality vs the goldens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from pccf.dist.sharding import make_2d_mesh
from pccf.dist.sp import sp_chamfer, sp_knn, sp_match_cost
from pccf.kernels import ops


def _clouds(b=4, n=64, m=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) / 2)
    y = jnp.asarray(rng.standard_normal((b, m, 3)).astype(np.float32) / 2)
    return x, y


def _mesh_1d() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ('mp',))


@pytest.mark.parametrize('batch_axis', [None, 'dp'])
def test_sp_chamfer_matches_golden(batch_axis):
    mesh = _mesh_1d() if batch_axis is None else make_2d_mesh(8, mp=4)
    x, y = _clouds()

    def sharded(a, b):
        return jnp.sum(sp_chamfer(a, b, mesh, batch_axis=batch_axis))

    def golden(a, b):
        return jnp.sum(ops.chamfer(a, b))

    np.testing.assert_allclose(sharded(x, y), golden(x, y), rtol=1e-5)
    gs = jax.grad(sharded, argnums=(0, 1))(x, y)
    gg = jax.grad(golden, argnums=(0, 1))(x, y)
    for a, b in zip(gs, gg, strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sp_chamfer_grad_never_traces_the_nn_kernel(monkeypatch):
    """On TPU the dispatched nn_distance kernel is a raw pallas_call with no
    AD rule; sp_chamfer must take only stop-gradient indices from it and
    re-express the distances differentiably.  Simulate the AD-less kernel
    with pure_callback (same failure class: no JVP rule) and require the
    gradient to still work and match the golden."""
    from pccf.kernels import api as kapi

    def ad_less_nn_distance(x, y):
        shapes = (
            jax.ShapeDtypeStruct(x.shape[:2], x.dtype),
            jax.ShapeDtypeStruct(x.shape[:2], jnp.int32),
            jax.ShapeDtypeStruct((x.shape[0], y.shape[1]), x.dtype),
            jax.ShapeDtypeStruct((x.shape[0], y.shape[1]), jnp.int32),
        )
        return jax.pure_callback(
            lambda a, b: tuple(np.asarray(v) for v in ops.nn_distance(a, b)),
            shapes, x, y, vmap_method='broadcast_all',
        )

    monkeypatch.setattr(kapi, 'nn_distance', ad_less_nn_distance)
    mesh = _mesh_1d()
    x, y = _clouds(b=2, n=32, m=32, seed=5)
    gs = jax.grad(lambda a, b: jnp.sum(sp_chamfer(a, b, mesh)), argnums=(0, 1))(x, y)
    gg = jax.grad(lambda a, b: jnp.sum(ops.chamfer(a, b)), argnums=(0, 1))(x, y)
    for a, b in zip(gs, gg, strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sp_chamfer_sum_reduction():
    mesh = _mesh_1d()
    x, y = _clouds(b=2, n=32, m=64, seed=3)
    got = sp_chamfer(x, y, mesh, reduction='sum')
    want = ops.chamfer(x, y, reduction='sum')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


@pytest.mark.parametrize('batch_axis', [None, 'dp'])
def test_sp_match_cost_matches_golden(batch_axis):
    mesh = _mesh_1d() if batch_axis is None else make_2d_mesh(8, mp=4)
    x, y = _clouds(b=2, n=64, m=32, seed=1)

    got = sp_match_cost(x, y, mesh, batch_axis=batch_axis)
    want = ops.match_cost(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    gs = jax.grad(lambda a, b: jnp.sum(sp_match_cost(a, b, mesh, batch_axis=batch_axis)), argnums=(0, 1))(x, y)
    gg = jax.grad(lambda a, b: jnp.sum(ops.match_cost(a, b)), argnums=(0, 1))(x, y)
    for a, b in zip(gs, gg, strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sp_knn_matches_golden():
    mesh = _mesh_1d()
    x, _ = _clouds(b=3, n=64, seed=2)
    got = np.asarray(sp_knn(x, 8, mesh))
    want = np.asarray(ops.knn(x, 8))
    np.testing.assert_array_equal(got, want)


def test_sp_validates_divisibility():
    mesh = _mesh_1d()
    x, y = _clouds(b=1, n=60, m=64)
    with pytest.raises(ValueError, match='not divisible'):
        sp_chamfer(x, y, mesh)
