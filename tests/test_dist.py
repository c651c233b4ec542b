"""Distribution helpers: mesh, sharding rules, launcher."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pccf.dist import get_mesh, host_batch_to_global, is_main_process, replicate, shard_batch
from pccf.dist.sharding import make_2d_mesh, shard_params_tp, tp_spec


class TestMesh:
    def test_mesh_and_sharded_batch(self):
        mesh = get_mesh()
        assert mesh.devices.size == 8
        batch = np.zeros((16, 4), np.float32)
        arr = shard_batch(batch, mesh)
        assert arr.sharding.shard_shape(arr.shape) == (2, 4)

    def test_replicate(self):
        mesh = get_mesh()
        tree = {'a': np.ones((3, 3), np.float32)}
        out = replicate(tree, mesh)
        assert out['a'].sharding.shard_shape((3, 3)) == (3, 3)  # full copy everywhere

    def test_host_batch_to_global_single_process(self):
        mesh = get_mesh()
        out = host_batch_to_global(np.ones((8, 2), np.float32), mesh)
        assert out.shape == (8, 2)

    def test_is_main_process(self):
        assert is_main_process() is True

    def test_mesh_subset(self):
        mesh = get_mesh(4)
        assert mesh.devices.size == 4


class TestTensorParallel:
    def test_2d_mesh(self):
        mesh = make_2d_mesh(8, mp=2)
        assert mesh.shape == {'dp': 4, 'mp': 2}

    def test_tp_spec_rules(self):
        mesh = make_2d_mesh(8, mp=2)
        big_kernel = np.zeros((64, 256), np.float32)
        spec = tp_spec(('dense', 'kernel'), big_kernel, mesh, 'mp', min_size=256)
        assert spec == jax.sharding.PartitionSpec(None, 'mp')
        bias = np.zeros((256,), np.float32)
        assert tp_spec(('dense', 'bias'), bias, mesh, 'mp', 256) == jax.sharding.PartitionSpec()
        small = np.zeros((8, 16), np.float32)
        assert tp_spec(('dense', 'kernel'), small, mesh, 'mp', 256) == jax.sharding.PartitionSpec()

    def test_shard_params_and_matmul(self):
        mesh = make_2d_mesh(8, mp=2)
        params = {'layer': {'kernel': np.random.default_rng(0).standard_normal((32, 256)).astype(np.float32)}}
        sharded = shard_params_tp(params, mesh, min_size=256)
        k = sharded['layer']['kernel']
        assert k.sharding.shard_shape((32, 256)) == (32, 128)  # column parallel
        x = jax.device_put(
            np.ones((4, 32), np.float32),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec('dp')),
        )
        out = jax.jit(lambda a, w: a @ w)(x, k)
        assert out.shape == (4, 256)
        np.testing.assert_allclose(
            np.asarray(out), np.ones((4, 32)) @ np.asarray(jax.device_get(k)), rtol=1e-4, atol=1e-4
        )


class TestLauncher:
    def test_launcher_runs_inline(self):
        from pccf.dist.launcher import DistributedWorker

        called = []
        DistributedWorker(lambda cfg: called.append(cfg), 4).spawn({'x': 1})
        assert called == [{'x': 1}]

    def test_launcher_rejects_oversubscription(self):
        from pccf.dist.launcher import DistributedWorker

        with pytest.raises(RuntimeError):
            DistributedWorker(lambda cfg: None, 99).spawn({})
