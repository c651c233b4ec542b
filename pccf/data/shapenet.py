"""ShapeNet (PointFlow PC15k layout) dataset (reference src/data/shapenet.py)."""

from __future__ import annotations

import json
import pathlib
from typing import Any

import numpy as np
from numpy import typing as npt

from pccf.data.augmentations import augment_clouds, normalise
from pccf.data.protocols import Partitions, PointCloudDataset, SplitCreator
from pccf.data.structures import Inputs, Targets

SHAPENET_LINK = 'https://drive.google.com/drive/folders/1G0rf-6HSHoTll6aH7voh-dXj6hCRhSAQ'


class ShapenetFlowSplit(PointCloudDataset):
    """15k-point clouds sampled to n_input_points without replacement
    (reference shapenet.py:18-59)."""

    def __init__(self, paths: list[pathlib.Path], cfg_data, seed: int = 0) -> None:
        self.input_points = cfg_data.n_input_points
        self.resample = cfg_data.resample
        self.augment = augment_clouds(cfg_data)
        self.rng = np.random.default_rng(seed)
        self.pcd: list[npt.NDArray[Any]] = []
        folder_ids = []
        for path in paths:
            pc, _scale = normalise(np.load(path))
            self.pcd.append(pc.astype(np.float32))
            folder_ids.append(path.parent.parent.name)
        id_map = {fid: i for i, fid in enumerate(sorted(set(folder_ids)))}
        self.labels = [id_map[fid] for fid in folder_ids]

    def __len__(self) -> int:
        return len(self.pcd)

    def __getitem__(self, index: int) -> tuple[Inputs, Targets]:
        np_cloud = self.pcd[index]
        label = np.int64(self.labels[index])
        pool = np_cloud.shape[0]
        if self.resample:
            sampling = self.rng.choice(pool, size=2 * self.input_points, replace=False)
            inp = np_cloud[sampling[: self.input_points]]
            ref = np_cloud[sampling[self.input_points :]]
            inp, ref = self.augment(self.rng, [inp, ref])
        else:
            sampling = self.rng.choice(pool, size=self.input_points, replace=False)
            inp = np_cloud[sampling]
            (inp,) = self.augment(self.rng, [inp])
            ref = inp
        return Inputs(cloud=inp), Targets(ref_cloud=ref, label=label)


class ShapeNetDatasetFlow(SplitCreator):
    """Directory-walk split creator over ShapeNetCore.v2.PC15k
    (reference shapenet.py:62-100)."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        user = cfg.user
        with open(user.path.metadata_dir / 'shapenet_PointFlow_classes.json') as f:
            self.classes = json.load(f)
        self.shapenet_path = user.path.data_dir / 'ShapeNetCore.v2.PC15k'
        if not self.shapenet_path.exists():
            raise FileNotFoundError(
                f'ShapeNet PC15k not found at {self.shapenet_path}; download from {SHAPENET_LINK}'
            )
        folders: Any = list(self.shapenet_path.glob('*'))
        if cfg.data.dataset.n_classes < 55:
            selected = cfg.data.dataset.settings['select_classes']
            folders = [f for f in folders if self.classes.get(f.name) in selected]
            assert folders, 'class is not in dataset'
        self.paths: dict[Partitions, list[pathlib.Path]] = {}
        for folder in folders:
            train = sorted((folder / 'train').glob('*'))
            val = sorted((folder / 'val').glob('*'))
            test = sorted((folder / 'test').glob('*'))
            self.paths.setdefault(Partitions.train, []).extend(train)
            self.paths.setdefault(Partitions.train_val, []).extend(train + val)
            self.paths.setdefault(Partitions.val, []).extend(val)
            self.paths.setdefault(Partitions.test, []).extend(test)

    def split(self, split: Partitions) -> ShapenetFlowSplit:
        return ShapenetFlowSplit(self.paths[split], self.cfg.data, seed=self.cfg.user.seed or 0)
