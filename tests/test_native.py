"""Native C++ batch assembler tests."""

import numpy as np
import pytest

from pccf import native


@pytest.fixture(scope='module')
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip('native library unavailable (no g++)')
    return lib


class TestNativeAssembler:
    def test_shapes_and_normalisation(self, lib):
        rng = np.random.default_rng(0)
        clouds = (rng.standard_normal((5, 256, 3)) * 3 + 1).astype(np.float32)
        ids = np.asarray([0, 2, 4], np.int64)
        out = native.assemble_batch(clouds, ids, n_out=128, seed=7)
        assert out.shape == (3, 128, 3)
        # unit-sphere normalised: centered, max radius ~1
        for b in range(3):
            center = out[b].mean(0)
            np.testing.assert_allclose(center, 0.0, atol=0.2)  # resampling shifts the mean slightly
            r = np.linalg.norm(out[b], axis=1).max()
            assert 0.8 < r <= 1.0 + 1e-5

    def test_jitter_bounds(self, lib):
        rng = np.random.default_rng(0)
        clouds = rng.standard_normal((2, 256, 3)).astype(np.float32)
        ids = np.asarray([0, 1], np.int64)
        plain = native.assemble_batch(clouds, ids, 128, seed=3)
        jittered = native.assemble_batch(clouds, ids, 128, seed=3, jitter_sigma=0.01, jitter_clip=0.01)
        delta = np.abs(jittered - plain)
        assert delta.max() <= 0.0100001
        assert delta.mean() > 1e-4  # jitter actually applied

    def test_deterministic_per_seed(self, lib):
        rng = np.random.default_rng(0)
        clouds = rng.standard_normal((2, 256, 3)).astype(np.float32)
        ids = np.asarray([1, 0], np.int64)
        a = native.assemble_batch(clouds, ids, 64, seed=11)
        b = native.assemble_batch(clouds, ids, 64, seed=11)
        np.testing.assert_array_equal(a, b)
        c = native.assemble_batch(clouds, ids, 64, seed=12)
        assert np.abs(a - c).max() > 0

    def test_resampling_draws_from_source(self, lib):
        rng = np.random.default_rng(0)
        clouds = rng.standard_normal((1, 64, 3)).astype(np.float32)
        out = native.assemble_batch(clouds, np.asarray([0], np.int64), 256, seed=5)
        # every output point must be a normalised copy of some source point:
        # renormalise the source the same way and check membership
        src = clouds[0]
        # the sampled subset's own mean/scale: verify pairwise-consistency by
        # checking that out has <= 64 unique rows
        uniq = np.unique(np.round(out[0], 5), axis=0)
        assert uniq.shape[0] <= 64


class TestNativeAugmentedAssembler:
    def _clouds(self, n_items=4, n_src=96, seed=0):
        return (np.random.default_rng(seed).standard_normal((n_items, n_src, 3)) * 2).astype(np.float32)

    def test_no_flags_ref_equals_cloud(self, lib):
        clouds = self._clouds()
        out, ref = native.assemble_batch_aug(clouds, np.asarray([0, 2], np.int64), 64, seed=5)
        np.testing.assert_array_equal(out, ref)
        # unit-sphere normalised like the plain path
        assert 0.8 < np.linalg.norm(out[0], axis=1).max() <= 1.0 + 1e-5

    def test_deterministic_per_seed(self, lib):
        clouds = self._clouds()
        a = native.assemble_batch_aug(clouds, np.asarray([1], np.int64), 64, 9, rotate=True, translate=True)
        b = native.assemble_batch_aug(clouds, np.asarray([1], np.int64), 64, 9, rotate=True, translate=True)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_rotation_about_y_preserves_height_and_radius(self, lib):
        clouds = self._clouds()
        ids = np.asarray([0, 1], np.int64)
        # same seed: the pre-rotation sample is identical, rotation is the
        # only difference (theta is drawn after the sampling stream)
        base, _ = native.assemble_batch_aug(clouds, ids, 64, seed=3)
        rot, rot_ref = native.assemble_batch_aug(clouds, ids, 64, seed=3, rotate=True)
        np.testing.assert_allclose(rot[..., 1], base[..., 1], atol=1e-6)  # y intact
        r_base = np.hypot(base[..., 0], base[..., 2])
        r_rot = np.hypot(rot[..., 0], rot[..., 2])
        np.testing.assert_allclose(r_rot, r_base, atol=1e-5)  # x-z radius intact
        assert np.abs(rot - base).max() > 1e-3  # actually rotated
        np.testing.assert_array_equal(rot, rot_ref)  # shared transform

    def test_scale_translate_is_shared_affine_within_bounds(self, lib):
        clouds = self._clouds()
        ids = np.asarray([0], np.int64)
        base, _ = native.assemble_batch_aug(clouds, ids, 64, seed=4)
        out, out_ref = native.assemble_batch_aug(clouds, ids, 64, seed=4, translate=True)
        np.testing.assert_array_equal(out, out_ref)
        # recover the per-axis affine from two points; all others must obey it
        for c in range(3):
            x, y = base[0, :, c], out[0, :, c]
            i, j = int(np.argmin(x)), int(np.argmax(x))
            sc = (y[j] - y[i]) / (x[j] - x[i])
            tr = y[i] - sc * x[i]
            np.testing.assert_allclose(y, sc * x + tr, atol=1e-4)
            assert 2 / 3 - 1e-6 <= sc <= 1.5 + 1e-6
            assert -0.2 - 1e-6 <= tr <= 0.2 + 1e-6

    def test_resample_ref_from_full_cloud_normalisation(self, lib):
        clouds = self._clouds(n_items=1, n_src=48)
        out, ref = native.assemble_batch_aug(
            clouds, np.asarray([0], np.int64), 128, seed=6, resample=True
        )
        # every ref row must be a row of normalise(full source cloud)
        src = clouds[0] - clouds[0].mean(0)
        src = src / np.linalg.norm(src, axis=1).max()
        d = np.linalg.norm(ref[0][:, None, :] - src[None, :, :], axis=-1).min(1)
        assert d.max() < 1e-5
        # and the input cloud is NOT just a subset of the same rows
        # (it is normalised over its own sample)
        assert np.abs(out - ref).max() > 1e-3


class TestDatasetIntegration:
    def test_modelnet_style_getitems(self, tmp_path, monkeypatch):
        from pccf.config import get_config_all
        from pccf.data.protocols import Singleton

        monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'e'))
        monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'd'))
        Singleton.reset_all()
        cfg = get_config_all(
            [
                'data/dataset=synthetic',
                'data.dataset.settings.n_train=8',
                'data.dataset.settings.base_points=96',
                'data.n_input_points=64',
                'user.seed=0',
            ]
        )
        # exercise the ModelNet-style native __getitems__ via a fake split
        from pccf.data.modelnet import ModelNet40Split

        rng = np.random.default_rng(0)
        pcd = rng.standard_normal((6, 96, 3)).astype(np.float32)
        labels = np.arange(6) % 2
        split = ModelNet40Split(pcd, np.zeros((6, 64, 8), np.int16), labels, cfg.data, seed=0)
        items = split.__getitems__([0, 3, 5])
        assert len(items) == 3
        assert items[0][0].cloud.shape == (64, 3)
        assert int(items[1][1].label) == 1
        assert np.isfinite(items[0][0].cloud).all()

    def test_augmented_getitems_native_path(self, tmp_path, monkeypatch):
        from pccf.config import get_config_all
        from pccf.data.modelnet import ModelNet40Split
        from pccf.data.protocols import Singleton

        monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'e'))
        monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'd'))
        Singleton.reset_all()
        cfg = get_config_all(
            [
                'data/dataset=synthetic',
                'data.n_input_points=64',
                'data.rotate=true',
                'data.translate=true',
                'data.resample=true',
                'user.seed=0',
            ]
        )
        rng = np.random.default_rng(1)
        pcd = rng.standard_normal((6, 96, 3)).astype(np.float32)
        split = ModelNet40Split(pcd, np.zeros((6, 64, 8), np.int16), np.arange(6) % 2, cfg.data, seed=0)
        items = split.__getitems__([0, 3, 5])
        assert len(items) == 3
        for inp, tgt in items:
            assert inp.cloud.shape == (64, 3) and tgt.ref_cloud.shape == (64, 3)
            assert np.isfinite(inp.cloud).all() and np.isfinite(tgt.ref_cloud).all()
            # resample=True: input and reference are distinct samples
            assert np.abs(inp.cloud - tgt.ref_cloud).max() > 1e-3


class TestNativeValidation:
    def test_out_of_range_item_id_raises(self, lib):
        clouds = np.random.default_rng(0).standard_normal((4, 32, 3)).astype(np.float32)
        with pytest.raises(ValueError, match='out of range'):
            native.assemble_batch(clouds, np.asarray([0, 4], np.int64), 16, seed=1)
        with pytest.raises(ValueError, match='out of range'):
            native.assemble_batch_aug(clouds, np.asarray([-1], np.int64), 16, seed=1)

    def test_empty_source_cloud_raises(self, lib):
        clouds = np.zeros((2, 0, 3), np.float32)
        with pytest.raises(ValueError, match='bad batch shapes'):
            native.assemble_batch(clouds, np.asarray([0], np.int64), 16, seed=1)
