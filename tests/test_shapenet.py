"""ShapenetFlowSplit / ShapeNetDatasetFlow over a synthetic PC15k tree."""

import json
import types

import numpy as np
import pytest

from pccf.data.protocols import Partitions, Singleton
from pccf.data.shapenet import ShapeNetDatasetFlow, ShapenetFlowSplit
from pccf.data.structures import Inputs, Targets

@pytest.fixture(autouse=True)
def _fresh_singletons():
    Singleton.reset_all()
    yield
    Singleton.reset_all()


SYNSETS = {'02691156': 'airplane', '02958343': 'car'}
POOL = 64


def make_tree(tmp_path, files_per_split=2):
    data_dir = tmp_path / 'data'
    meta_dir = tmp_path / 'meta'
    meta_dir.mkdir()
    (meta_dir / 'shapenet_PointFlow_classes.json').write_text(json.dumps(SYNSETS))
    root = data_dir / 'ShapeNetCore.v2.PC15k'
    rng = np.random.default_rng(0)
    for synset in SYNSETS:
        for sub in ('train', 'val', 'test'):
            d = root / synset / sub
            d.mkdir(parents=True)
            for i in range(files_per_split):
                np.save(d / f'{synset}_{sub}_{i}.npy', rng.normal(size=(POOL, 3)))
    return data_dir, meta_dir


def make_cfg(data_dir, meta_dir, n_classes=2, select=None, n_points=16, resample=True):
    ns = types.SimpleNamespace
    return ns(
        user=ns(path=ns(data_dir=data_dir, metadata_dir=meta_dir), seed=3),
        data=ns(
            dataset=ns(
                n_classes=n_classes,
                settings={'select_classes': select or ['airplane', 'car']},
            ),
            n_input_points=n_points,
            resample=resample,
            rotate=False,
            translate=False,
        ),
    )


class TestShapeNetDatasetFlow:
    def test_partition_tables(self, tmp_path):
        cfg = make_cfg(*make_tree(tmp_path))
        creator = ShapeNetDatasetFlow(cfg)
        assert len(creator.paths[Partitions.train]) == 4
        assert len(creator.paths[Partitions.val]) == 4
        assert len(creator.paths[Partitions.test]) == 4
        train_val = creator.paths[Partitions.train_val]
        assert len(train_val) == 8
        assert set(train_val) == set(creator.paths[Partitions.train]) | set(
            creator.paths[Partitions.val]
        )

    def test_class_selection_filters_synsets(self, tmp_path):
        cfg = make_cfg(*make_tree(tmp_path), n_classes=1, select=['car'])
        creator = ShapeNetDatasetFlow(cfg)
        assert all('02958343' in str(p) for p in creator.paths[Partitions.train])

    def test_unknown_class_raises(self, tmp_path):
        cfg = make_cfg(*make_tree(tmp_path), n_classes=1, select=['boat'])
        with pytest.raises(ValueError, match='selected classes'):
            ShapeNetDatasetFlow(cfg)

    def test_missing_tree_raises(self, tmp_path):
        _, meta_dir = make_tree(tmp_path)
        cfg = make_cfg(tmp_path / 'nowhere', meta_dir)
        with pytest.raises(FileNotFoundError):
            ShapeNetDatasetFlow(cfg)


class TestShapenetFlowSplit:
    def test_resample_gives_disjoint_ref(self, tmp_path):
        cfg = make_cfg(*make_tree(tmp_path))
        split = ShapeNetDatasetFlow(cfg).split(Partitions.train)
        assert isinstance(split, ShapenetFlowSplit)
        inputs, targets = split[0]
        assert isinstance(inputs, Inputs) and isinstance(targets, Targets)
        assert inputs.cloud.shape == (16, 3)
        assert targets.ref_cloud.shape == (16, 3)
        # disjoint draws: no input point equals any reference point
        eq = (inputs.cloud[:, None, :] == targets.ref_cloud[None, :, :]).all(-1)
        assert not eq.any()

    def test_no_resample_shares_cloud(self, tmp_path):
        cfg = make_cfg(*make_tree(tmp_path), resample=False)
        split = ShapeNetDatasetFlow(cfg).split(Partitions.val)
        inputs, targets = split[1]
        np.testing.assert_array_equal(inputs.cloud, targets.ref_cloud)

    def test_labels_are_synset_ranks(self, tmp_path):
        cfg = make_cfg(*make_tree(tmp_path))
        split = ShapeNetDatasetFlow(cfg).split(Partitions.test)
        labels = {int(split[i][1].label) for i in range(len(split))}
        assert labels == {0, 1}

    def test_clouds_unit_normalised(self, tmp_path):
        cfg = make_cfg(*make_tree(tmp_path))
        split = ShapeNetDatasetFlow(cfg).split(Partitions.train)
        radii = np.linalg.norm(split.clouds, axis=-1).max(-1)
        np.testing.assert_allclose(radii, 1.0, rtol=1e-5)
