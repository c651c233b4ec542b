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


class TestInitializeDistributed:
    def test_idempotent_when_already_initialized(self, monkeypatch):
        """Every training entry point calls initialize_distributed in main()
        AND again inside DistributedWorker.spawn; the second call must be a
        no-op instead of letting jax.distributed.initialize raise
        RuntimeError (which, under a coordinator env var, would abort exactly
        the multi-host startup the function exists for)."""
        import jax

        from pccf.dist.mesh import initialize_distributed

        calls = []
        monkeypatch.setattr(jax.distributed, 'is_initialized', lambda: True)
        monkeypatch.setattr(
            jax.distributed,
            'initialize',
            lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(RuntimeError('twice')),
        )
        monkeypatch.setenv('JAX_COORDINATOR_ADDRESS', 'localhost:1234')
        initialize_distributed()  # must return without touching initialize
        assert not calls


class TestShardBatchStrict:
    def test_zero_d_leaf_raises_value_error(self):
        """The strict diagnostic must not itself crash with IndexError when a
        0-d leaf (e.g. a scalar epoch field) makes the batch indivisible."""
        import pytest as _pytest

        mesh = get_mesh()
        with _pytest.raises(ValueError, match='0-d leaf'):
            shard_batch({'x': np.float32(3.0)}, mesh, strict=True)


class TestReconstructionHookMesh:
    def test_reconstruct_uses_trainer_submesh(self):
        """The reconstruction-logging hooks must shard their sample batch on
        the TRAINER's mesh: when batch_size forces a gcd sub-mesh, the model
        variables live there, and sharding the hook inputs on the full
        get_mesh() raises 'incompatible devices' (regression: hooks called
        get_mesh() directly)."""
        from pccf.config import get_config_all
        from pccf.models import get_autoencoder
        from pccf.data.structures import Inputs, Targets
        from pccf.train import DataLoader, Model, Trainer, get_autoencoder_loss, get_learning_schema
        from pccf.train.hooks import _reconstruct

        cfg = get_config_all(
            [
                'data/dataset=synthetic',
                'data.dataset.n_classes=2',
                'data.n_input_points=128',
                'data.n_target_points=128',
                'data.n_neighbors=8',
                'autoencoder.model.w_dim=64',
                'autoencoder.model.embedding_dim=4',
                'autoencoder.model.book_size=8',
                'autoencoder.model.encoder.n_neighbors=8',
                'autoencoder.model.decoder.map_dims=[16]',
                'autoencoder.model.decoder.conv_dims=[32,16]',
                'autoencoder.model.decoder.n_components=2',
                'autoencoder.model.decoder.sample_dim=4',
                'autoencoder.objective.recon_loss=Chamfer',
                'autoencoder.train.batch_size=4',
                'user.seed=0',
            ]
        )
        rng = np.random.default_rng(0)
        cloud = rng.standard_normal((4, 128, 3)).astype(np.float32)

        class _DS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return (Inputs(cloud=cloud[i]), Targets(ref_cloud=cloud[i], label=np.int64(0)))

        model = Model(get_autoencoder(cfg), name='hook-mesh-test', seed=0)
        model.initialize(Inputs(cloud=cloud[:1]), np.zeros((1, 2), np.float32), method='full_init')
        # batch_size 4 on 8 devices -> Trainer falls back to a gcd sub-mesh
        trainer = Trainer(
            model, DataLoader(_DS(), 4), get_autoencoder_loss(cfg), get_learning_schema(cfg.autoencoder)
        )
        assert trainer.mesh.devices.size < jax.device_count(), 'expected a gcd sub-mesh'
        trainer.train_until(1)  # variables now live on the sub-mesh
        recons = _reconstruct(trainer, _DS(), 2)
        assert recons.shape[0] == 2 and np.isfinite(recons).all()


class TestLauncherDeviceRestriction:
    def test_spawn_restricts_default_mesh(self):
        """DistributedWorker(fn, n) must make get_mesh() default to n devices
        inside fn (regression: the count was only an upper-bound check and
        the run silently spanned all attached devices)."""
        from pccf.dist.launcher import DistributedWorker

        sizes = []

        def work(cfg):
            sizes.append(get_mesh().devices.size)

        DistributedWorker(work, 2).spawn({})
        assert sizes == [2]
        # the default is restored after the run
        assert get_mesh().devices.size == jax.device_count()
