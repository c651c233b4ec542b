"""End-to-end training-slice tests on synthetic data (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pccf.config import Experiment, get_config_all
from pccf.data import Partitions, get_dataset, get_datasets
from pccf.data.protocols import Singleton
from pccf.nn import get_classifier
from pccf.train import (
    DataLoader,
    EarlyStoppingCallback,
    Model,
    Test,
    Trainer,
    get_classification_loss,
    get_learning_schema,
    get_trailing_mean,
)

TINY = [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=16',
    'data.dataset.settings.n_test=8',
    'data.dataset.settings.base_points=128',
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=8',
    'classifier.model.n_neighbors=8',
    'classifier.model.conv_dims=[8,16]',
    'classifier.model.mlp_dims=[16,16]',
    'classifier.model.feature_dim=16',
    'classifier.train.batch_size=8',
    'classifier.train.n_epochs=2',
    'user.seed=0',
    'user.trackers.tensorboard=false',
    'user.checkpoint_every=0',
]


@pytest.fixture()
def cfg(tmp_path, monkeypatch):
    monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'exp'))
    monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
    Singleton.reset_all()
    return get_config_all(TINY)


class TestSyntheticData:
    def test_dataset_splits(self, cfg):
        train, val = get_datasets(cfg)
        assert len(train) == 16
        inputs, targets = train[0]
        assert inputs.cloud.shape == (64, 3)
        assert targets.ref_cloud.shape == (64, 3)
        val.set_inference(True)
        vi, vt = val[0]
        assert vi.indices is not None and vi.indices.shape == (64, 8)

    def test_loader_shapes(self, cfg):
        train, _ = get_datasets(cfg)
        loader = DataLoader(train, batch_size=8)
        batches = list(loader.epoch_iterator(epoch=1))
        assert len(batches) == 2
        inputs, targets = batches[0]
        assert inputs.cloud.shape == (8, 64, 3)
        assert targets.label.shape == (8,)


class TestClassifierE2E:
    def test_train_eval_checkpoint(self, cfg):
        from pccf.train import get_trackers

        exp = Experiment(cfg, name='e2e-test')
        for tracker in get_trackers(cfg):
            exp.subscribe(tracker)
        with exp.create_run():
            module = get_classifier(cfg)
            model = Model(module, name='DGCNN', seed=0)
            train_ds, val_ds = get_datasets(cfg)
            train_loader = DataLoader(train_ds, cfg.classifier.train.batch_size_per_device)
            val_loader = DataLoader(val_ds, cfg.classifier.train.batch_size_per_device)
            sample = train_ds[0]
            model.initialize(
                type(sample[0])(cloud=np.stack([sample[0].cloud])), train=False
            )
            loss = get_classification_loss()
            schema = get_learning_schema(cfg.classifier)
            trainer = Trainer(model, train_loader, loss, schema)
            trainer.add_validation(val_loader)
            trainer.post_epoch_hooks.register(
                EarlyStoppingCallback(metric=loss, filter_fn=get_trailing_mean(3), patience=50)
            )
            trainer.train_until(cfg.classifier.train.n_epochs)
            assert model.epoch == 2
            assert len(trainer.metrics_log) == 2
            assert np.isfinite(trainer.metrics_log[-1]['CrossEntropy'])
            assert 'Accuracy' in trainer.validation_log[-1]

            final_test = Test(model, val_loader, metric=loss, name='FinalTest')
            results = final_test(store_outputs=True)
            assert 0.0 <= results['Accuracy'] <= 1.0
            logits = np.concatenate([np.asarray(o) for o in final_test.outputs_list])
            assert logits.shape[0] == len(val_ds)

            # checkpoint roundtrip
            trainer.save_checkpoint()
            old = jax.device_get(model.params)
            model2 = Model(module, name='DGCNN', seed=0)
            model2.initialize(
                type(sample[0])(cloud=np.stack([sample[0].cloud])), train=False
            )
            model2.load_state()
            assert model2.epoch == 2
            restored = jax.device_get(model2.params)
            a = jax.tree.leaves(old)[0]
            b = jax.tree.leaves(restored)[0]
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

            # CSV tracker artifact exists
            csvs = list((exp.exp_dir / 'metrics').glob('*.csv'))
            assert csvs, 'CSV metric logs missing'

    def test_resume_with_optimizer_state(self, cfg):
        from pccf.train import get_trackers

        exp = Experiment(cfg, name='resume-test')
        with exp.create_run():
            module = get_classifier(cfg)
            train_ds, _ = get_datasets(cfg)
            loader = DataLoader(train_ds, cfg.classifier.train.batch_size_per_device)
            sample = train_ds[0]
            init_in = type(sample[0])(cloud=np.stack([sample[0].cloud]))

            model = Model(module, name='DGCNN-R', seed=0)
            model.initialize(init_in, train=False)
            loss = get_classification_loss()
            schema = get_learning_schema(cfg.classifier)
            trainer = Trainer(model, loader, loss, schema)
            trainer.train_until(1)
            trainer.save_checkpoint()

            # load_checkpoint must invalidate the compiled step: it bakes the
            # non-param collections and the optimiser object in as constants,
            # which a restored checkpoint may replace
            assert trainer._train_fn is not None
            trainer.load_checkpoint()
            assert trainer._train_fn is None

            model2 = Model(module, name='DGCNN-R', seed=0)
            model2.initialize(init_in, train=False)
            trainer2 = Trainer(model2, loader, loss, schema)
            trainer2.load_checkpoint()
            assert model2.epoch == 1
            # optimizer state restored (momentum buffers nonzero after 1 epoch)
            state = trainer2.state
            leaves = [np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(state.opt_state)]
            assert any(l > 0 for l in leaves)
            trainer2.train_until(2)
            assert model2.epoch == 2

    def test_resume_weights_only_continues_lr_schedule(self, cfg):
        """Restoring a weights-only checkpoint (no _opt sidecar) must align
        optax's internal schedule count with the restored epoch — otherwise
        warmup/decay silently restart from epoch 0."""
        exp = Experiment(cfg, name='lr-resume-test')
        with exp.create_run():
            module = get_classifier(cfg)
            train_ds, _ = get_datasets(cfg)
            loader = DataLoader(train_ds, cfg.classifier.train.batch_size_per_device)
            sample = train_ds[0]
            init_in = type(sample[0])(cloud=np.stack([sample[0].cloud]))
            model = Model(module, name='DGCNN-L', seed=0)
            model.initialize(init_in, train=False)
            loss = get_classification_loss()
            schema = get_learning_schema(cfg.classifier)
            trainer = Trainer(model, loader, loss, schema)
            trainer.train_until(1)
            model.save_state()  # weights only, no optimizer sidecar

            model2 = Model(module, name='DGCNN-L', seed=0)
            model2.initialize(init_in, train=False)
            model2.load_state()
            assert model2.epoch == 1
            trainer2 = Trainer(model2, loader, loss, schema)
            state = trainer2.state
            steps = trainer2._steps_per_epoch()
            counts: list[int] = []

            def collect(node):
                if hasattr(node, '_fields'):
                    for f in node._fields:
                        if f == 'count':
                            counts.append(int(getattr(node, f)))
                        else:
                            collect(getattr(node, f))
                elif isinstance(node, (list, tuple)):
                    for v in node:
                        collect(v)
                elif isinstance(node, dict):
                    for v in node.values():
                        collect(v)

            collect(state.opt_state)
            assert counts and all(c == steps for c in counts)

    def test_update_variables_from_keeps_placement(self, cfg):
        """Host-numpy variables installed by the codebook hook must come back
        with the old state leaves' sharding (no layout change, no recompile)."""
        exp = Experiment(cfg, name='placement-test')
        with exp.create_run():
            module = get_classifier(cfg)
            train_ds, _ = get_datasets(cfg)
            loader = DataLoader(train_ds, cfg.classifier.train.batch_size_per_device)
            sample = train_ds[0]
            model = Model(module, name='DGCNN-P', seed=0)
            model.initialize(type(sample[0])(cloud=np.stack([sample[0].cloud])), train=False)
            trainer = Trainer(
                model, loader, get_classification_loss(), get_learning_schema(cfg.classifier)
            )
            before = trainer.state
            old_shardings = [x.sharding for x in jax.tree.leaves(before.params)]
            host_vars = jax.device_get(model.variables)  # all-numpy tree
            trainer.update_variables_from(host_vars)
            after = trainer.state
            new_leaves = jax.tree.leaves(after.params)
            assert all(
                isinstance(x, jax.Array) and x.sharding == s
                for x, s in zip(new_leaves, old_shardings)
            )

    def test_mid_epoch_failure_keeps_model_usable(self, cfg):
        """A failure inside the epoch loop must leave model.variables holding
        live (not donated/deleted) buffers from the last completed step."""
        exp = Experiment(cfg, name='midfail-test')
        with exp.create_run():
            module = get_classifier(cfg)
            train_ds, _ = get_datasets(cfg)
            loader = DataLoader(train_ds, cfg.classifier.train.batch_size_per_device)
            sample = train_ds[0]
            model = Model(module, name='DGCNN-F', seed=0)
            model.initialize(type(sample[0])(cloud=np.stack([sample[0].cloud])), train=False)
            trainer = Trainer(
                model, loader, get_classification_loss(), get_learning_schema(cfg.classifier)
            )
            trainer.train_until(1)

            real_iter = loader.epoch_iterator

            def failing_iter(epoch, **kw):
                it = real_iter(epoch, **kw)
                yield next(it)  # one donating step runs
                raise RuntimeError('simulated mid-epoch failure')

            loader.epoch_iterator = failing_iter
            with pytest.raises(RuntimeError, match='mid-epoch'):
                trainer.train_until(3)
            loader.epoch_iterator = real_iter
            # the model's params are intact and usable
            leaves = jax.tree.leaves(model.params)
            assert all(not getattr(x, 'is_deleted', lambda: False)() for x in leaves)
            assert np.isfinite(np.asarray(leaves[0])).all()

    def test_lr_schedule_applied(self):
        # default config: cosine over 45 epochs (interpolated) from 0.01
        default_cfg = get_config_all()
        schema = get_learning_schema(default_cfg.classifier)
        assert abs(schema.lr_at(0) - 0.01) < 1e-9
        assert schema.lr_at(44) < schema.lr_at(1) < schema.lr_at(0) + 1e-12
        # tiny override interpolates restart/decay to n_epochs=2
        tiny = get_config_all(TINY)
        tiny_schema = get_learning_schema(tiny.classifier)
        assert tiny_schema.lr_at(1) < tiny_schema.lr_at(0)


class TestShardedTraining:
    def test_batch_is_sharded_over_mesh(self, cfg):
        from pccf.dist import get_mesh, shard_batch

        mesh = get_mesh()
        assert mesh.devices.size == 8  # virtual CPU mesh from conftest
        batch = np.zeros((16, 8, 3), np.float32)
        sharded = shard_batch(batch, mesh)
        assert sharded.sharding.shard_shape(sharded.shape)[0] == 2


class TestFlattenedOptimizer:
    def test_flat_opt_matches_per_leaf(self, cfg, monkeypatch):
        """PCCF_FLAT_OPT wraps the optimizer in optax.flatten (one fused
        update over a contiguous buffer).  AdamW + uniform weight decay +
        a shared lr schedule are leaf-position-independent, so 2 epochs of
        training must produce identical parameters either way."""

        def train_params(flat: str):
            monkeypatch.setenv('PCCF_FLAT_OPT', flat)
            Singleton.reset_all()
            module = get_classifier(cfg)
            model = Model(module, name=f'DGCNN-{flat}', seed=0)
            train_ds, _ = get_datasets(cfg)
            sample = train_ds[0]
            model.initialize(
                type(sample[0])(cloud=np.stack([sample[0].cloud])), train=False
            )
            trainer = Trainer(
                model,
                DataLoader(train_ds, cfg.classifier.train.batch_size_per_device),
                get_classification_loss(),
                get_learning_schema(cfg.classifier),
            )
            trainer.train_until(cfg.classifier.train.n_epochs)
            return jax.device_get(model.params)

    
        flat, per_leaf = train_params('1'), train_params('0')
        for a, b in zip(jax.tree.leaves(flat), jax.tree.leaves(per_leaf), strict=True):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
