"""Multiprocess batch-assembly workers (reference DataLoader(n_workers=...),
train_autoencoder.py:34-39).

Workers are spawn-based dataset copies; augmentation RNG is reseeded per
(seed, epoch, batch) so the stream is deterministic regardless of worker
count or scheduling.
"""

import numpy as np
import pytest

from pccf.config import get_config_all
from pccf.data import get_datasets
from pccf.data.protocols import Singleton
from pccf.train import DataLoader

TINY = [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=12',
    'data.dataset.settings.n_test=4',
    'data.dataset.settings.base_points=96',
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=6',
]


@pytest.fixture()
def train_dataset(tmp_path, monkeypatch):
    monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
    Singleton.reset_all()
    cfg = get_config_all(TINY)
    train, _ = get_datasets(cfg)
    return train


def _epoch(loader, epoch=1):
    return [
        (np.asarray(inp.cloud), np.asarray(tgt.ref_cloud if hasattr(tgt, 'ref_cloud') else tgt[0]))
        for inp, tgt in loader.epoch_iterator(epoch)
    ]


class TestWorkerLoader:
    def test_shapes_and_count(self, train_dataset):
        loader = DataLoader(train_dataset, 4, n_workers=2)
        try:
            batches = _epoch(loader)
            assert len(batches) == 3
            for cloud, ref in batches:
                assert cloud.shape == (4, 64, 3)
                assert np.isfinite(cloud).all()
        finally:
            loader.close()

    def test_deterministic_across_worker_counts(self, train_dataset):
        """Same (seed, epoch) -> identical batches for 1 and 2 workers."""
        out = {}
        for n_workers in (1, 2):
            loader = DataLoader(train_dataset, 4, n_workers=n_workers, seed=7)
            try:
                out[n_workers] = _epoch(loader, epoch=3)
            finally:
                loader.close()
        for (c1, r1), (c2, r2) in zip(out[1], out[2], strict=True):
            np.testing.assert_array_equal(c1, c2)
            np.testing.assert_array_equal(r1, r2)

    def test_user_seed_reaches_worker_streams(self, tmp_path, monkeypatch):
        """The loader defaults its seed from the dataset's user.seed-derived
        seed, so two experiments with different user.seed get different
        shuffles AND different worker-side augmentation streams (regression:
        the worker reseed used only the loader's constant default 0)."""
        monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
        batches = {}
        for seed in (0, 1):
            Singleton.reset_all()
            cfg = get_config_all(TINY + [f'user.seed={seed}'])
            train, _ = get_datasets(cfg)
            loader = DataLoader(train, 4, n_workers=2)
            assert loader.seed == seed
            batches[seed] = _epoch(loader)
            loader.close()
        assert any(
            a[0].shape != b[0].shape or np.abs(a[0] - b[0]).max() > 1e-6
            for a, b in zip(batches[0], batches[1])
        )

    def test_in_process_matches_workers(self, train_dataset):
        """n_workers=0 must produce the same augmentation stream as the
        worker path: both reseed per (seed, epoch, batch) (regression: the
        in-process _fetch consumed the dataset's stateful rng, so 0-worker
        runs were irreproducible vs worker runs and across resumes)."""
        out = {}
        for n_workers in (0, 2):
            loader = DataLoader(train_dataset, 4, n_workers=n_workers, seed=7)
            try:
                out[n_workers] = _epoch(loader, epoch=3)
            finally:
                loader.close()
        for (c1, r1), (c2, r2) in zip(out[0], out[2], strict=True):
            np.testing.assert_array_equal(c1, c2)
            np.testing.assert_array_equal(r1, r2)

    def test_abandoned_iterator_releases_producer_thread(self, train_dataset):
        """Breaking out of a prefetched epoch mid-way must not leave the
        producer thread blocked in q.put() forever."""
        import threading
        import time

        loader = DataLoader(train_dataset, 2, n_workers=0)
        before = threading.active_count()
        it = loader.epoch_iterator(1, prefetch=1)
        next(it)  # producer running, queue full
        it.close()  # consumer abandons -> finally sets stop
        for _ in range(100):
            if threading.active_count() <= before:
                break
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_zero_training_batches_raises(self, train_dataset):
        loader = DataLoader(train_dataset, batch_size=len(train_dataset) + 1)
        with pytest.raises(ValueError, match='no training batches'):
            loader.n_batches(inference=False)
        # inference path still serves the partial batch
        assert loader.n_batches(inference=True) == 1

    def test_device_backed_dataset_falls_back(self, train_dataset):
        class DeviceBacked:
            supports_workers = False

            def __len__(self):
                return 4

            def __getitem__(self, i):
                return train_dataset[i]

        loader = DataLoader(DeviceBacked(), 2, n_workers=4)
        assert loader.n_workers == 0
        assert loader._pool is None
        batches = list(loader.epoch_iterator(1))
        assert len(batches) == 2
