"""Deterministic synthetic point-cloud dataset (pccf addition).

Generates simple parametric shapes per class (sphere / box / torus /
cylinder surfaces with deformation noise) so the full pipeline — training,
evaluation, benchmarking — runs offline.  Same Inputs/Targets contract and
augmentation path as the real datasets: the training item path (and the
native C++ batched assembler) is inherited from
:class:`~pccf.data.modelnet.ModelNet40Split`.
"""

from __future__ import annotations

import numpy as np

from pccf.data.augmentations import normalise
from pccf.data.modelnet import ModelNet40Split, index_k_neighbours
from pccf.data.protocols import Partitions, SplitCreator
from pccf.data.structures import Inputs, Targets

_N_KINDS = 4  # sphere, box, torus, cylinder


def _shape_cloud(
    rng: np.random.Generator, kind: int, n: int, variability: float = 0.0
) -> np.ndarray:
    """One surface sample of the class ``kind``.

    ``variability`` in [0, 1] draws per-INSTANCE shape parameters (ellipsoid
    axes, box aspect, torus tube ratio, cylinder taper/aspect) so classes
    have real intra-class spread and overlap — the "comparable difficulty"
    surrogate regime for the offline quality runs (the classes are no longer
    separable by a single radius statistic once squashed tori, slim boxes and
    tapered cylinders coexist).  ``variability=0`` reproduces the original
    fixed shapes exactly (same rng stream), keeping earlier datasets and
    tests bit-identical.
    """
    u = rng.random(n) * 2 * np.pi
    v = rng.random(n)
    if kind % _N_KINDS == 0:  # sphere -> random ellipsoid
        phi = np.arccos(2 * v - 1)
        pts = np.stack([np.sin(phi) * np.cos(u), np.sin(phi) * np.sin(u), np.cos(phi)], 1)
        if variability:
            pts = pts * (1.0 - 0.45 * variability * rng.random(3))
    elif kind % _N_KINDS == 1:  # box surface -> random aspect box
        pts = rng.random((n, 3)) * 2 - 1
        face = rng.integers(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        pts[np.arange(n), face] = sign
        if variability:
            pts = pts * (1.0 - 0.5 * variability * rng.random(3))
    elif kind % _N_KINDS == 2:  # torus -> random tube ratio + squash
        w = rng.random(n) * 2 * np.pi
        r, rr = 1.0, 0.35
        if variability:
            rr = 0.35 + variability * rng.uniform(-0.15, 0.25)
        pts = np.stack(
            [(r + rr * np.cos(w)) * np.cos(u), (r + rr * np.cos(w)) * np.sin(u), rr * np.sin(w)], 1
        )
        if variability:
            pts[:, 2] *= 1.0 + variability * rng.uniform(-0.3, 1.0)
    else:  # cylinder -> random aspect + cone taper
        radius = np.ones(n)
        height = 2 * v - 1
        if variability:
            taper = variability * rng.uniform(0.0, 0.8)
            radius = 1.0 - taper * (height + 1.0) / 2.0
            height = height * (1.0 + variability * rng.uniform(-0.4, 0.4))
        pts = np.stack([radius * np.cos(u), radius * np.sin(u), height], 1)
    pts = pts + 0.02 * rng.standard_normal((n, 3))
    return pts.astype(np.float32)


class SyntheticSplit(ModelNet40Split):
    """Training path = ModelNet40Split (incl. the native batched assembler);
    inference normalises the truncated base cloud instead of assuming the
    stored clouds are pre-normalised like the h5 archive."""

    def __getitem__(self, index: int) -> tuple[Inputs, Targets]:
        if not self.inference:
            return super().__getitem__(index)
        np_cloud = self.pcd[index]
        cloud = normalise(np_cloud[: self.input_points].copy())[0].astype(np.float32)
        idx = self.indices[index] if self.indices is not None else None
        return Inputs(cloud=cloud, indices=idx), Targets(
            ref_cloud=cloud, label=np.int64(self.labels[index])
        )


class SyntheticDataset(SplitCreator):
    """Split creator: ``settings`` keys ``n_train``, ``n_test``, ``base_points``."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        settings = cfg.data.dataset.settings
        n_classes = cfg.data.dataset.n_classes
        if n_classes > _N_KINDS:
            raise ValueError(
                f'synthetic dataset has {_N_KINDS} distinct shape kinds; '
                f'n_classes={n_classes} would alias labels to identical shapes'
            )
        n_train = int(settings.get('n_train', 64))
        n_test = int(settings.get('n_test', 32))
        base_points = int(settings.get('base_points', max(2048, cfg.data.n_input_points)))
        variability = float(settings.get('variability', 0.0))
        rng = np.random.default_rng(12345)
        self.data: dict[Partitions, tuple] = {}
        counts = {
            Partitions.train: n_train,
            Partitions.val: max(n_test // 2, n_classes),
            Partitions.test: n_test,
        }
        for part, count in counts.items():
            clouds = np.stack(
                [_shape_cloud(rng, i % n_classes, base_points, variability) for i in range(count)]
            )
            labels = np.asarray([i % n_classes for i in range(count)], np.int64)
            self.data[part] = (clouds, labels)
        # final-mode contract: train_val is the union of train and val, like
        # every real dataset (shapenet _PARTITION_SOURCES, modelnet unsplit)
        self.data[Partitions.train_val] = (
            np.concatenate([self.data[Partitions.train][0], self.data[Partitions.val][0]]),
            np.concatenate([self.data[Partitions.train][1], self.data[Partitions.val][1]]),
        )
        self._index_cache: dict[Partitions, np.ndarray] = {}

    def split(self, split: Partitions) -> SyntheticSplit:
        clouds, labels = self.data[split]
        n_in = self.cfg.data.n_input_points
        k = self.cfg.data.n_neighbors
        indices = None
        if split in (Partitions.val, Partitions.test):
            if split not in self._index_cache:  # one device pass per partition
                normed = np.stack([normalise(c[:n_in].copy())[0] for c in clouds]).astype(
                    np.float32
                )
                self._index_cache[split] = index_k_neighbours(normed, k).astype(np.int32)
            indices = self._index_cache[split]
        return SyntheticSplit(clouds, indices, labels, self.cfg.data, seed=self.cfg.user.seed or 0)
