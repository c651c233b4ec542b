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
