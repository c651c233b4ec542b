"""Deterministic synthetic point-cloud dataset (pccf addition).

Generates simple parametric shapes per class (sphere / box / torus /
cylinder surfaces with deformation noise) so the full pipeline — training,
evaluation, benchmarking — runs offline.  Same Inputs/Targets contract and
augmentation path as the real datasets.
"""

from __future__ import annotations

import numpy as np

from pccf.data.augmentations import augment_clouds, jitter_cloud, normalise
from pccf.data.protocols import Partitions, PointCloudDataset, SplitCreator
from pccf.data.structures import Inputs, Targets


def _shape_cloud(rng: np.random.Generator, kind: int, n: int) -> np.ndarray:
    u = rng.random(n) * 2 * np.pi
    v = rng.random(n)
    if kind % 4 == 0:  # sphere
        phi = np.arccos(2 * v - 1)
        pts = np.stack([np.sin(phi) * np.cos(u), np.sin(phi) * np.sin(u), np.cos(phi)], 1)
    elif kind % 4 == 1:  # box surface
        pts = rng.random((n, 3)) * 2 - 1
        face = rng.integers(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        pts[np.arange(n), face] = sign
    elif kind % 4 == 2:  # torus
        w = rng.random(n) * 2 * np.pi
        r, rr = 1.0, 0.35
        pts = np.stack(
            [(r + rr * np.cos(w)) * np.cos(u), (r + rr * np.cos(w)) * np.sin(u), rr * np.sin(w)], 1
        )
    else:  # cylinder
        pts = np.stack([np.cos(u), np.sin(u), 2 * v - 1], 1)
    pts = pts + 0.02 * rng.standard_normal((n, 3))
    return pts.astype(np.float32)


class SyntheticSplit(PointCloudDataset):
    def __init__(self, clouds, indices, labels, cfg_data, seed: int = 0) -> None:
        self.pcd = clouds
        self.indices = indices
        self.labels = labels
        self.input_points = cfg_data.n_input_points
        self.resample = cfg_data.resample
        self.augment = augment_clouds(cfg_data)
        self.jitter = jitter_cloud(cfg_data)
        self.rng = np.random.default_rng(seed)
        self.seed = seed  # loaders derive their shuffle/worker streams from this

    def __len__(self) -> int:
        return len(self.pcd)

    def __getitem__(self, index: int):
        np_cloud = self.pcd[index]
        label = np.int64(self.labels[index])
        if not self.inference:
            rng = self.rng
            pool = np_cloud.shape[0]
            sampled = rng.choice(pool, size=self.input_points, replace=True)
            cloud = normalise(np_cloud[sampled].copy())[0].astype(np.float32)
            cloud = self.jitter(rng, cloud)
            if self.resample:
                sampled2 = rng.choice(pool, size=self.input_points, replace=True)
                ref = normalise(np_cloud.copy())[0][sampled2].astype(np.float32)
                cloud, ref = self.augment(rng, [cloud, ref])
            else:
                (cloud,) = self.augment(rng, [cloud])
                ref = cloud
            return Inputs(cloud=cloud), Targets(ref_cloud=ref, label=label)
        cloud = normalise(np_cloud[: self.input_points].copy())[0].astype(np.float32)
        idx = self.indices[index] if self.indices is not None else None
        return Inputs(cloud=cloud, indices=idx), Targets(ref_cloud=cloud, label=label)


class SyntheticDataset(SplitCreator):
    """Split creator: ``settings`` keys ``n_train``, ``n_test``, ``base_points``."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        settings = cfg.data.dataset.settings
        n_classes = cfg.data.dataset.n_classes
        n_train = int(settings.get('n_train', 64))
        n_test = int(settings.get('n_test', 32))
        base_points = int(settings.get('base_points', max(2048, cfg.data.n_input_points)))
        rng = np.random.default_rng(12345)
        self.data: dict[Partitions, tuple] = {}
        counts = {
            Partitions.train: n_train,
            Partitions.val: max(n_test // 2, n_classes),
            Partitions.test: n_test,
        }
        for part, count in counts.items():
            clouds = np.stack(
                [_shape_cloud(rng, i % n_classes, base_points) for i in range(count)]
            )
            labels = np.asarray([i % n_classes for i in range(count)], np.int64)
            self.data[part] = (clouds, labels)

    def split(self, split: Partitions) -> SyntheticSplit:
        if split == Partitions.train_val:
            split = Partitions.train
        clouds, labels = self.data[split]
        n_in = self.cfg.data.n_input_points
        k = self.cfg.data.n_neighbors
        indices = None
        if split in (Partitions.val, Partitions.test):
            from pccf.data.modelnet import index_k_neighbours

            from pccf.data.augmentations import normalise as _norm

            normed = np.stack([_norm(c[:n_in].copy())[0] for c in clouds]).astype(np.float32)
            indices = index_k_neighbours(normed, k).astype(np.int32)
        return SyntheticSplit(clouds, indices, labels, self.cfg.data, seed=self.cfg.user.seed or 0)
