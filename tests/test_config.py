"""Config composition + validation tests."""

import pathlib

import pytest

from pccf.config import compose, get_config_all, validate_config
from pccf.config.options import AutoEncoders, Datasets, GradOp

CONFIG_DIR = pathlib.Path(__file__).resolve().parents[1] / 'configs' / 'experiment'


class TestCompose:
    def test_default_tree_composes(self):
        tree = compose(CONFIG_DIR)
        assert tree['variation'] == 'main'
        assert tree['autoencoder']['model']['w_dim'] == 1024
        assert tree['classifier']['model']['conv_dims'] == [64, 64, 128, 256]
        assert tree['w_autoencoder']['objective']['c_kld2'] == 4

    def test_interpolation(self):
        tree = compose(CONFIG_DIR)
        # ${data.n_neighbors} in encoder config
        assert tree['autoencoder']['model']['encoder']['n_neighbors'] == tree['data']['n_neighbors'] == 25
        # nested scheduler interpolation against classifier epochs
        assert tree['classifier']['train']['learn']['scheduler']['restart_interval'] == 45
        # _n_subprocesses pulls user.n_subprocesses
        assert tree['autoencoder']['train']['_n_subprocesses'] == 0

    def test_value_overrides(self):
        tree = compose(CONFIG_DIR, overrides=['data.n_neighbors=10', 'user.seed=3', 'final=true'])
        assert tree['data']['n_neighbors'] == 10
        assert tree['autoencoder']['model']['encoder']['n_neighbors'] == 10
        assert tree['user']['seed'] == 3
        assert tree['final'] is True

    def test_group_overrides(self):
        tree = compose(CONFIG_DIR, overrides=['data/dataset=modelnet_bottle_bowl_cup_vase'])
        assert tree['data']['dataset']['n_classes'] == 4
        tree = compose(CONFIG_DIR, overrides=['data/dataset=shapenet'])
        assert tree['data']['dataset']['name'] == 'ShapenetFlow'

    def test_list_index_override(self):
        tree = compose(CONFIG_DIR, overrides=['classifier.model.dropout_rates.0=0.1'])
        assert tree['classifier']['model']['dropout_rates'][0] == 0.1

    def test_typoed_value_override_rejected(self):
        """Hydra strictness: a typo'd key must error, not create a junk key
        the run silently ignores while the user believes it took effect."""
        from pccf.config.compose import ComposeError

        with pytest.raises(ComposeError, match="prefix with '\\+'"):
            compose(CONFIG_DIR, overrides=['autoencoder.train.learn.learning_rte=0.5'])
        # explicit additions still work
        tree = compose(CONFIG_DIR, overrides=['+user.extra_flag=1'])
        assert tree['user']['extra_flag'] == 1

    def test_typoed_group_selection_rejected(self):
        from pccf.config.compose import ComposeError

        with pytest.raises(ComposeError, match='unknown config group'):
            compose(CONFIG_DIR, overrides=['data/datset=shapenet'])

    def test_cli_final_marker_not_doubled(self, monkeypatch, tmp_path):
        """final=true + any override must yield exactly one trailing '_final'
        (regression: folding overrides into cfg.name doubled the marker), and
        group-selection keys must not inject '/' into the experiment name."""
        import sys

        from pccf.config.cli import hydra_main
        from pccf.data.protocols import Singleton

        monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'exp'))
        monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
        Singleton.reset_all()
        captured = {}

        @hydra_main
        def main(cfg):
            captured['name'] = cfg.name

        monkeypatch.setattr(
            sys, 'argv',
            ['prog', 'final=true', 'user.seed=1', 'data/dataset=synthetic',
             'data.dataset.n_classes=2'],
        )
        main()
        name = captured['name']
        # exactly one trailing marker ('_final-true' is the override TAG,
        # not the marker)
        assert name.endswith('_final') and not name.endswith('_final_final'), name
        assert '/' not in name

    def test_adam_weight_decay_is_coupled_like_torch(self):
        """'Adam' with weight_decay must reproduce torch.optim.Adam's COUPLED
        L2 (decay folded into the gradient before the moment estimates), not
        AdamW's decoupled form."""
        import numpy as np
        import jax.numpy as jnp
        import torch

        from pccf.config.specs import get_optimizer

        p0, g0, lr, wd = 0.7, 0.3, 0.1, 0.5
        tx = get_optimizer('Adam')(lr, weight_decay=wd)
        params = {'w': jnp.asarray([p0], jnp.float32)}
        state = tx.init(params)
        updates, _ = tx.update({'w': jnp.asarray([g0], jnp.float32)}, state, params)
        ours = float(params['w'][0] + updates['w'][0])

        tp = torch.nn.Parameter(torch.tensor([p0]))
        opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
        tp.grad = torch.tensor([g0])
        opt.step()
        assert abs(ours - float(tp.detach()[0])) < 1e-6

    def test_package_global_directive(self, tmp_path):
        """A group option file declaring '# @package _global_' merges at the
        root instead of under its group key."""
        (tmp_path / 'opt').mkdir()
        (tmp_path / 'defaults.yaml').write_text('defaults:\n  - opt: a\nroot_key: 1\n')
        (tmp_path / 'opt' / 'a.yaml').write_text('# @package _global_\ntop: 2\n')
        tree = compose(tmp_path)
        assert tree['top'] == 2 and 'opt' not in tree
        (tmp_path / 'opt' / 'a.yaml').write_text('# @package some.where\ndeep: 3\n')
        tree = compose(tmp_path)
        assert tree['some']['where']['deep'] == 3


class TestValidate:
    def test_full_validation(self):
        cfg = get_config_all()
        assert cfg.autoencoder.model.class_name == AutoEncoders.CounterfactualVQVAE
        assert cfg.autoencoder.model.n_codes == 256
        assert cfg.data.dataset.name == Datasets.ModelNet
        assert cfg.w_autoencoder.train.learn.grad_op == GradOp.ParamHistClipper
        assert cfg.classifier.train.batch_size_per_device == 16
        assert cfg.name == 'main'

    def test_batch_divisibility_enforced(self):
        with pytest.raises(Exception):
            validate_config(compose(CONFIG_DIR, overrides=['user.n_subprocesses=3']))

    def test_per_device_batch(self):
        cfg = get_config_all(['user.n_subprocesses=4'])
        assert cfg.classifier.train.batch_size_per_device == 4

    def test_activation_resolution(self):
        cfg = get_config_all()
        import jax.numpy as jnp

        act = cfg.w_autoencoder.model.w_encoder.act_cls
        assert float(act(jnp.asarray(1.0))) > 0.8  # GELU(1) ~ 0.84
        default = cfg.autoencoder.model.encoder.act_cls
        assert abs(float(default(jnp.asarray(-1.0))) + 0.2) < 1e-6  # LeakyReLU 0.2

    def test_user_cpu_applies_platform(self, monkeypatch):
        """``user.cpu=true`` must actually move jax to CPU (reference
        parallel.py:46-51 gloo path) — the flag was previously inert."""
        import os

        import jax

        monkeypatch.delenv('JAX_PLATFORMS', raising=False)
        cfg = get_config_all(['user.cpu=true'])
        assert cfg.user.platform == 'cpu'
        assert os.environ['JAX_PLATFORMS'] == 'cpu'
        assert jax.devices()[0].platform == 'cpu'

    def test_optimizer_resolution(self):
        cfg = get_config_all()
        opt = cfg.autoencoder.train.learn.optimizer_cls(1e-3, **cfg.autoencoder.train.learn.opt_settings)
        assert hasattr(opt, 'init') and hasattr(opt, 'update')


class TestDeletionOverrides:
    def test_tilde_deletes_key(self):
        tree = compose(CONFIG_DIR, overrides=['~data.resample'])
        assert 'resample' not in tree['data']

    def test_tilde_with_value_form(self):
        """Hydra grammar also allows '~key=value' (value advisory)."""
        tree = compose(CONFIG_DIR, overrides=['~data.resample=false'])
        assert 'resample' not in tree['data']

    def test_tilde_missing_key_is_compose_error(self):
        """A typo'd deletion must produce the friendly ComposeError, not a
        raw KeyError traceback (regression)."""
        from pccf.config.compose import ComposeError

        with pytest.raises(ComposeError, match='deletion override'):
            compose(CONFIG_DIR, overrides=['~data.n_neighbor'])


class TestReadYamlCache:
    def test_rewritten_file_is_not_served_stale(self, tmp_path):
        """_read_yaml memoizes on (path, mtime): rewriting a config file must
        invalidate, and callers must get an independent copy (composition
        mutates the returned dict)."""
        import os
        import time as _time

        from pccf.config.compose import _read_yaml

        p = tmp_path / 'c.yaml'
        p.write_text('a: 1\n')
        d1, _ = _read_yaml(p)
        assert d1 == {'a': 1}
        d1['mutated'] = True  # must not leak into the cache
        d2, _ = _read_yaml(p)
        assert d2 == {'a': 1}
        p.write_text('a: 2\n')
        os.utime(p, ns=(int(_time.time() * 1e9), int(_time.time() * 1e9) + 1))
        d3, _ = _read_yaml(p)
        assert d3 == {'a': 2}
