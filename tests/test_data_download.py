"""ModelNet auto-download wiring + multi-host staggered dataset construction.

Covers the reference's first-use download (src/data/modelnet.py:116-118) with
a mocked urllib, and the rank-staggered construction barrier
(src/data/dataset.py:37-54) with mocked process topology.
"""

import pathlib
import zipfile

import numpy as np
import pytest

from pccf.config import get_config_all
from pccf.data import Partitions, get_dataset
from pccf.data.protocols import Singleton

MODELNET_OVERRIDES = [
    'data/dataset=modelnet_bottle_bowl_cup_vase',
    'data.n_input_points=64',
    'data.n_target_points=64',
    'data.n_neighbors=8',
    'user.seed=0',
]


def _classes() -> list[str]:
    root = pathlib.Path(__file__).resolve().parents[1]
    return (root / 'dataset_metadata' / 'modelnet_classes.txt').read_text().splitlines()


def _write_fake_archive_zip(zip_path: pathlib.Path) -> None:
    """A tiny modelnet40_hdf5_2048.zip: train/test h5 with the selected classes."""
    import h5py

    classes = _classes()
    selected = [classes.index(c) for c in ('bottle', 'bowl', 'cup', 'vase')]
    rng = np.random.default_rng(0)
    tmp = zip_path.parent / 'h5src'
    tmp.mkdir(exist_ok=True)
    specs = {'ply_data_train0.h5': 12, 'ply_data_test0.h5': 6}
    with zipfile.ZipFile(zip_path, 'w') as zf:
        for name, n in specs.items():
            path = tmp / name
            with h5py.File(path, 'w') as f:
                f.create_dataset('data', data=rng.standard_normal((n, 64, 3)).astype('float32'))
                f.create_dataset(
                    'label', data=np.asarray(selected * (n // 4 + 1))[:n].astype('int64')
                )
            zf.write(path, arcname=f'modelnet40_hdf5_2048/{name}')


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv('ROOT_EXP_DIR', str(tmp_path / 'exp'))
    monkeypatch.setenv('DATASET_DIR', str(tmp_path / 'data'))
    Singleton.reset_all()
    return tmp_path


class TestAutoDownload:
    def test_download_extract_zip_mocked(self, env, monkeypatch):
        from pccf.utils import download as dl

        src_zip = env / 'src.zip'
        _write_fake_archive_zip(src_zip)
        calls = []

        def fake_urlretrieve(url, dest):
            calls.append(url)
            pathlib.Path(dest).write_bytes(src_zip.read_bytes())

        monkeypatch.setattr(dl.urllib.request, 'urlretrieve', fake_urlretrieve)
        target = env / 'data' / 'modelnet40_hdf5_2048'
        dl.download_extract_zip(target, 'http://example.com/modelnet.zip')
        assert calls == ['http://example.com/modelnet.zip']
        assert sorted(p.name for p in target.iterdir()) == [
            'ply_data_test0.h5',
            'ply_data_train0.h5',
        ]
        # idempotent: second call is a no-op (no re-download)
        dl.download_extract_zip(target, 'http://example.com/modelnet.zip')
        assert len(calls) == 1

    def test_download_offline_raises_with_instructions(self, env, monkeypatch):
        from pccf.utils import download as dl

        def offline(url, dest):
            raise OSError('no route to host')

        monkeypatch.setattr(dl.urllib.request, 'urlretrieve', offline)
        with pytest.raises(FileNotFoundError, match='manually'):
            dl.download_extract_zip(env / 'data' / 'nope', 'http://example.com/x.zip')

    def test_modelnet_autodownloads_then_loads(self, env, monkeypatch):
        import h5py

        from pccf.utils import download as dl

        src_zip = env / 'src.zip'
        _write_fake_archive_zip(src_zip)
        monkeypatch.setattr(
            dl.urllib.request,
            'urlretrieve',
            lambda url, dest: pathlib.Path(dest).write_bytes(src_zip.read_bytes()),
        )
        cfg = get_config_all(MODELNET_OVERRIDES)
        train = get_dataset(cfg, Partitions.train)
        assert len(train) == 10  # 12 train minus 1-in-6 val picks
        inputs, targets = train[0]
        assert inputs.cloud.shape == (64, 3)
        assert 0 <= int(targets.label) < 4
        # kNN cache written back into the downloaded h5 (reference :150-156)
        h5_path = env / 'data' / 'modelnet40_hdf5_2048' / 'ply_data_train0.h5'
        with h5py.File(h5_path, 'r') as f:
            assert 'index_8_64' in f and f['index_8_64'].shape == (12, 64, 8)


class TestMultihostStagger:
    def test_rank0_constructs_first_behind_barrier(self, env, monkeypatch):
        import jax
        from jax.experimental import multihost_utils

        from pccf.data import dataset as dataset_mod

        events = []
        monkeypatch.setattr(jax, 'process_count', lambda: 2)
        monkeypatch.setattr(jax, 'process_index', lambda: 0)
        monkeypatch.setattr(
            multihost_utils, 'sync_global_devices', lambda name: events.append(('barrier', name))
        )

        class _Creator:
            instances = 0

            def __init__(self, cfg):
                type(self).instances += 1
                events.append(('construct', type(self).instances))

            def split(self, partition):
                return f'split:{partition.name}'

        out = dataset_mod._staggered_construct(_Creator, cfg=None)
        # rank 0: construct -> barrier -> (second construct, not a singleton here)
        assert events[0] == ('construct', 1)
        assert events[1][0] == 'barrier'
        assert out.split(Partitions.train) == 'split:train'

        # non-zero rank: barrier first, then construct
        events.clear()
        _Creator.instances = 0
        monkeypatch.setattr(jax, 'process_index', lambda: 1)
        dataset_mod._staggered_construct(_Creator, cfg=None)
        assert events[0][0] == 'barrier'
        assert events[1] == ('construct', 1)
