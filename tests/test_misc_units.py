"""Misc unit tests: compose edge cases, trackers, debug utils, visualization."""

import numpy as np
import pytest

from pccf.config.compose import apply_overrides, compose, split_overrides


class TestComposeEdgeCases:
    def test_delete_override(self):
        tree = {'a': {'b': 1, 'c': 2}}
        out = apply_overrides(tree, ['~a.b'])
        assert 'b' not in out['a'] and out['a']['c'] == 2

    def test_additive_override_creates_path(self):
        out = apply_overrides({}, ['+x.y.z=3'])
        assert out['x']['y']['z'] == 3

    def test_typed_values(self):
        # '+' because the keys don't pre-exist (plain overrides are strict)
        out = apply_overrides({}, ['+a=true', '+b=1e-3', '+c=[1,2]', '+d=null', '+e=text'])
        assert out['a'] is True
        assert out['b'] == pytest.approx(1e-3)
        assert out['c'] == [1, 2]
        assert out['d'] is None
        assert out['e'] == 'text'

    def test_split_overrides(self):
        groups, values = split_overrides(['data/dataset=shapenet', 'a.b=1', '+c=2'])
        assert groups == {'data/dataset': 'shapenet'}
        assert values == ['a.b=1', '+c=2']

    def test_missing_group_raises(self, tmp_path):
        (tmp_path / 'root.yaml').write_text('defaults:\n  - sub: missing\n')
        with pytest.raises(Exception):
            compose(tmp_path, 'root')


class TestTrackers:
    def _cfg_flags(self, **kw):
        class Flags:
            csv = kw.get('csv', False)
            hydra = kw.get('hydra', False)
            tensorboard = kw.get('tensorboard', False)
            sqlalchemy = kw.get('sqlalchemy', False)
            wandb = kw.get('wandb', False)

        class User:
            trackers = Flags()

        class Cfg:
            user = User()

        return Cfg()

    def test_sqlite_tracker_roundtrip(self, tmp_path):
        from pccf.train.trackers import SQLiteTracker

        class Exp:
            exp_dir = tmp_path

        t = SQLiteTracker()
        t.start(Exp())
        t.log_metrics('m', 'Train', 3, {'loss': 1.5, 'acc': 0.9})
        import sqlite3

        conn = sqlite3.connect(tmp_path / 'metrics.db')
        rows = conn.execute('SELECT model, source, epoch, name, value FROM metrics ORDER BY name').fetchall()
        assert rows == [('m', 'Train', 3, 'acc', 0.9), ('m', 'Train', 3, 'loss', 1.5)]
        t.stop()

    def test_get_trackers_flags(self, tmp_path):
        from pccf.train.trackers import BuiltinLogger, CSVDumper, SQLiteTracker, get_trackers

        trackers = get_trackers(self._cfg_flags(csv=True, sqlalchemy=True, wandb=True))
        kinds = {type(t) for t in trackers}
        assert BuiltinLogger in kinds and CSVDumper in kinds and SQLiteTracker in kinds
        # wandb gated out gracefully (not installed)
        assert all('Wandb' not in type(t).__name__ for t in trackers)


class TestDebugUtils:
    def test_step_timer(self):
        from pccf.utils.debug import StepTimer

        timer = StepTimer()
        for _ in range(3):
            with timer:
                sum(range(1000))
        s = timer.summary()
        assert s['count'] == 3 and s['total_s'] > 0

    def test_nan_debug_toggle(self):
        import jax

        from pccf.utils.debug import disable_nan_debugging, enable_nan_debugging

        enable_nan_debugging()
        assert jax.config.jax_debug_nans
        disable_nan_debugging()
        assert not jax.config.jax_debug_nans


class TestCSVDumper:
    def _dumper(self, tmp_path):
        from types import SimpleNamespace

        from pccf.train.trackers import CSVDumper

        d = CSVDumper()
        d.start(SimpleNamespace(exp_dir=tmp_path))
        return d

    def test_resume_appends_aligned_rows(self, tmp_path):
        """A resumed run must append under the EXISTING header; a new metric
        extends the header by rewriting, never silently dropping columns."""
        import csv as _csv

        d = self._dumper(tmp_path)
        d.log_metrics('m', 'train', 1, {'Loss': 1.0})
        d.stop()
        d2 = self._dumper(tmp_path)
        d2.log_metrics('m', 'train', 2, {'Loss': 0.5, 'Chamfer': 0.2})
        d2.log_metrics('m', 'train', 3, {'Loss': 0.4, 'Chamfer': 0.1, 'EMD': 9.0})
        d2.stop()
        with open(tmp_path / 'metrics' / 'm_train.csv', newline='') as fh:
            rows = list(_csv.DictReader(fh))
        assert [r['epoch'] for r in rows] == ['1', '2', '3']
        assert rows[0]['Chamfer'] == '' and rows[1]['Chamfer'] == '0.2'
        assert rows[2]['EMD'] == '9.0'  # mid-run metric not dropped


class TestVisualization:
    def test_render_cloud_saves_png(self, tmp_path):
        from pccf.utils.visualization import render_cloud

        cloud = np.random.default_rng(0).standard_normal((64, 3)).astype(np.float32)
        out = render_cloud((cloud,), title='test: cloud (0.5)', save_dir=tmp_path)
        assert out is not None and out.exists() and out.suffix == '.png'

    def test_rasterizer_zbuffer_occlusion(self):
        """A sphere nearer the camera must occlude a farther one on the same
        ray: the pixel at the shared screen position takes the NEAR colour."""
        from pccf.utils.visualization import _EYE, _rasterize

        ray = -_EYE / np.linalg.norm(_EYE)  # camera -> origin direction
        near = _EYE + 2.0 * ray
        far = _EYE + 4.0 * ray
        red, blue = np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])
        rgba = _rasterize(
            [far[None, :], near[None, :]],
            [blue, red],
            [np.asarray(0.05), np.asarray(0.05)],
            size=128,
        )
        centre = rgba[64, 64]
        assert centre[3] == 1.0  # covered
        assert centre[0] > centre[2]  # red (near) wins over blue (far)
        # swapping draw order must not change the result (true z-buffer)
        rgba2 = _rasterize(
            [near[None, :], far[None, :]],
            [red, blue],
            [np.asarray(0.05), np.asarray(0.05)],
            size=128,
        )
        np.testing.assert_allclose(rgba[64, 64], rgba2[64, 64], atol=1e-12)

    def test_render_cloud_blue_red_and_arrows(self, tmp_path):
        from pccf.utils.visualization import render_cloud

        rng = np.random.default_rng(1)
        clouds = [rng.standard_normal((32, 3)) * 0.3 for _ in range(3)]
        arrows = 0.2 * rng.standard_normal((32, 3))
        out = render_cloud(
            clouds, colorscale='blue_red', arrows=arrows, title='b2r',
            save_dir=tmp_path, size=128,
        )
        assert out is not None and out.exists()
        from matplotlib import pyplot as plt

        img = plt.imread(out)
        assert img.shape == (128, 128, 4) and img[..., 3].max() == 1.0

    def test_render_cloud_empty_cloud_keeps_colors_and_arrow_base(self, tmp_path):
        """An empty cloud must not shift the blue/red color positions of the
        remaining clouds, and arrows always anchor to the caller's FIRST
        cloud — a mismatch fails loudly instead of mis-drawing."""
        from pccf.utils.visualization import render_cloud

        rng = np.random.default_rng(3)
        recon = rng.standard_normal((32, 3)) * 0.3
        empty = np.zeros((0, 3))
        out = render_cloud(
            (empty, recon), colorscale='blue_red', title='empty-first',
            save_dir=tmp_path, size=64,
        )
        assert out is not None and out.exists()
        import pytest

        with pytest.raises(ValueError, match='first cloud'):
            render_cloud(
                (empty, recon), colorscale='blue_red',
                arrows=0.1 * rng.standard_normal((32, 3)),
                title='bad-arrows', save_dir=tmp_path, size=64,
            )

    def test_html_viewer_escapes_title(self, tmp_path):
        from pccf.utils.visualization import write_html_viewer

        cloud = np.zeros((4, 3), np.float32)
        path = write_html_viewer(
            [cloud], [np.array([0.1, 0.2, 0.3])],
            'recon <eps=0.5> & </script>', tmp_path / 'esc.html',
            names=['a</script>b'],
        )
        text = path.read_text()
        assert '<eps=0.5>' not in text  # escaped in markup
        assert '</script>b' not in text  # JSON cannot close the script tag

    def test_render_cloud_interactive_writes_html_viewer(self, tmp_path):
        from pccf.utils.visualization import render_cloud

        cloud = np.random.default_rng(2).standard_normal((16, 3)) * 0.3
        render_cloud(
            (cloud,), title='orbit me', interactive=True, save_dir=tmp_path,
            size=64,
        )
        html = tmp_path / 'orbit_me.html'
        assert html.exists()
        text = html.read_text()
        assert 'CLOUDS=' in text and text.count(',') > 16 * 3  # embedded points
        assert 'addEventListener' in text  # orbit controls inline

    def test_render_cloud_empty_returns_none(self):
        from pccf.utils.visualization import render_cloud

        assert render_cloud([np.zeros((0, 3))]) is None

    def test_confusion_matrix(self):
        from pccf.utils.visualization import confusion_matrix

        pred = np.asarray([0, 1, 1, 0])
        true = np.asarray([0, 1, 0, 0])
        cm = confusion_matrix(pred, true, 2)
        np.testing.assert_array_equal(cm, [[2, 1], [0, 1]])


class TestAugmentations:
    def test_normalise_unit_sphere(self):
        from pccf.data.augmentations import normalise

        cloud = np.random.default_rng(0).standard_normal((100, 3)) * 7 + 3
        out, std = normalise(cloud.copy())
        np.testing.assert_allclose(out.mean(0), 0, atol=1e-6)
        assert abs(np.linalg.norm(out, axis=1).max() - 1.0) < 1e-6
        assert std > 0

    def test_shared_rotation_across_group(self):
        from pccf.data.augmentations import CloudAugmenter

        rng = np.random.default_rng(0)
        a = rng.standard_normal((32, 3)).astype(np.float32)
        aug = CloudAugmenter(rotation=True, translation_and_scale=False)
        out_a, out_b = aug(np.random.default_rng(1), [a.copy(), a.copy()])
        np.testing.assert_allclose(out_a, out_b, atol=1e-6)  # same transform
        # y preserved, x-z rotated
        np.testing.assert_allclose(out_a[:, 1], a[:, 1], atol=1e-6)
        assert np.abs(out_a[:, 0] - a[:, 0]).max() > 1e-3
