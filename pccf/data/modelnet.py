"""ModelNet40 dataset (reference src/data/modelnet.py), h5-backed.

Differences from the reference, by design:
- kNN index precompute runs **on accelerator** through the framework's own
  pairwise-distance/top-k kernels (batched) instead of a per-cloud CPU
  KDTree; results are cached back into the h5 file under ``index_{k}``
  exactly like the reference (modelnet.py:150-156).
- Auto-download is attempted but fails with a clear message in offline
  environments (the reference URL, modelnet.py:116-118).
"""

from __future__ import annotations

import logging
import pathlib
from typing import Any

import numpy as np
from numpy import typing as npt

from pccf.data.augmentations import augment_clouds, jitter_cloud, normalise
from pccf.data.protocols import Partitions, PointCloudDataset, SplitCreator
from pccf.data.structures import Inputs, Targets

logger = logging.getLogger('pccf')

MODELNET_URL = 'https://gaimfs.ugent.be/Public/Dataset/modelnet40_hdf5_2048.zip'


def index_k_neighbours(pcs: npt.NDArray[Any], k: int, chunk: int = 64) -> npt.NDArray[Any]:
    """Batched kNN indices on the default accelerator (replaces the
    reference's sklearn KDTree loop, neighbour_ops.py:16-24)."""
    import jax
    import jax.numpy as jnp

    from pccf.kernels import ops

    knn_fn = jax.jit(lambda x: ops.knn(x, k))
    out = []
    for i in range(0, pcs.shape[0], chunk):
        batch = jnp.asarray(pcs[i : i + chunk], jnp.float32)
        out.append(np.asarray(jax.device_get(knn_fn(batch))))
    return np.concatenate(out, axis=0)


class ModelNet40Split(PointCloudDataset):
    """One partition view (reference modelnet.py:21-60)."""

    def __init__(self, pcd, indices, labels, cfg_data, seed: int = 0) -> None:
        self.pcd = np.asarray(pcd, np.float32)  # no copy: load_h5 already yields f32
        self.indices = indices
        self.labels = labels
        self.input_points = cfg_data.n_input_points
        self.resample = cfg_data.resample
        self.augment = augment_clouds(cfg_data)
        self.jitter = jitter_cloud(cfg_data)
        self.rng = np.random.default_rng(seed)
        self.seed = seed  # loaders derive their shuffle/worker streams from this

    def __len__(self) -> int:
        return self.pcd.shape[0]

    def __getitems__(self, idx_list) -> list[tuple[Inputs, Targets]]:
        """Batched fetch: native C++ assembler on the whole training path
        (resample + normalise + jitter + shared rotation/scale/translation;
        inference keeps the per-item cached path)."""
        if not self.inference:
            from pccf import native

            pair = native.assemble_batch_aug(
                self.pcd,
                np.asarray(idx_list, np.int64),
                self.input_points,
                seed=int(self.rng.integers(2**62)),
                jitter_sigma=self.jitter.sigma or 0.0,
                jitter_clip=self.jitter.clip or 0.0,
                resample=self.resample,
                rotate=self.augment.rotation,
                translate=self.augment.translation_and_scale,
            )
            if pair is not None:
                cloud_b, ref_b = pair
                return [
                    (Inputs(cloud=cloud_b[i]), Targets(ref_cloud=ref_b[i], label=np.int64(self.labels[j])))
                    for i, j in enumerate(idx_list)
                ]
        return [self[int(i)] for i in idx_list]

    def __getitem__(self, index: int) -> tuple[Inputs, Targets]:
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
        cloud = np_cloud
        return Inputs(cloud=cloud, indices=self.indices[index].astype(np.int32)), Targets(
            ref_cloud=cloud, label=label
        )


class ModelNet40Dataset(SplitCreator):
    """Loads the modelnet40_hdf5_2048 archive, selects classes, builds splits
    (reference modelnet.py:63-135)."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        cfg_data = cfg.data
        user = cfg.user
        with open(user.path.metadata_dir / 'modelnet_classes.txt') as f:
            self.classes = f.read().splitlines()
        selected = cfg_data.dataset.settings['select_classes']
        try:
            selected_labels = [self.classes.index(c) for c in selected]
        except ValueError as ve:
            raise ValueError(f'One of classes in {selected} not in the dataset') from ve
        label_map = {old: new for new, old in enumerate(selected_labels)}

        self.modelnet_path = user.path.data_dir / 'modelnet40_hdf5_2048'
        if not self.modelnet_path.exists():
            # fetch on first use (reference modelnet.py:116-118); raises a
            # FileNotFoundError with manual instructions when offline
            from pccf.utils.download import download_extract_zip

            download_extract_zip(self.modelnet_path, MODELNET_URL)
        self.pcd: dict[Partitions, Any] = {}
        self.indices: dict[Partitions, Any] = {}
        self.labels: dict[Partitions, Any] = {}
        for split in (Partitions.train, Partitions.test):
            pcd, indices, labels = self.load_h5(
                self.modelnet_path,
                f'*{split.name}*.h5',
                cfg_data.n_input_points,
                cfg_data.n_neighbors,
            )
            if cfg_data.dataset.n_classes == 40:
                # the 40-class path keeps EVERY sample (reference
                # modelnet.py:98-99) but still remaps through label_map; a
                # select_classes list that doesn't cover all 40 would crash
                # np.vectorize on a None label deep in construction (the
                # reference has the same latent failure) — validate here
                missing = sorted(set(range(len(self.classes))) - set(selected_labels))
                if missing:
                    raise ValueError(
                        f'dataset.n_classes=40 keeps all samples, so '
                        f'select_classes must cover all 40 classes; missing: '
                        f'{[self.classes[i] for i in missing]}'
                    )
                sel = slice(None)
            else:
                sel = np.isin(labels, selected_labels)
            self.pcd[split] = pcd[sel]
            self.indices[split] = indices[sel]
            self.labels[split] = np.vectorize(label_map.get)(labels[sel])

    def split(self, split: Partitions) -> ModelNet40Split:
        if split == Partitions.train_val:
            assert Partitions.val not in self.pcd, 'train dataset has already been split'
            split = Partitions.train
        elif split in (Partitions.train, Partitions.val) and Partitions.val not in self.pcd:
            self._split_train_val()
        return ModelNet40Split(
            self.pcd[split], self.indices[split], self.labels[split], self.cfg.data,
            seed=self.cfg.user.seed or 0,
        )

    def _split_train_val(self, val_every: int = 6) -> None:
        """Deterministic 1-in-6 train/val partition (modelnet.py:120-127)."""
        n = self.pcd[Partitions.train].shape[0]
        idx = np.arange(n)
        val_mask = np.zeros(n, dtype=bool)
        # every val_every-th element counted from the end (reference semantics)
        val_mask[idx[::-1][::val_every]] = True
        for new_split, mask in ((Partitions.val, val_mask), (Partitions.train, ~val_mask)):
            self.pcd[new_split] = self.pcd[Partitions.train][mask]
            self.indices[new_split] = self.indices[Partitions.train][mask]
            self.labels[new_split] = self.labels[Partitions.train][mask]

    @staticmethod
    def load_h5(
        path: pathlib.Path, wild: str, input_points: int, k: int
    ) -> tuple[Any, Any, Any]:
        import h5py

        pcd_list, idx_list, label_list = [], [], []
        for h5_name in sorted(path.glob(wild)):
            # read-only first: a cached index needs no write access (the
            # reference's unconditional 'r+' fails on read-only data dirs and
            # races between concurrent runs, reference modelnet.py:139)
            with h5py.File(h5_name, 'r') as f:
                logger.info('Load: %s', h5_name)
                pcs = np.asarray(f['data'])[:, :input_points, :].astype('float32')
                labels = np.asarray(f['label']).astype('int64')
                # the key carries the truncation: a bare index_{k} computed
                # at a different n_input_points holds out-of-range neighbour
                # rows that gather would silently clamp
                index_key = f'index_{k}_{input_points}'
                legacy_key = f'index_{k}'
                index = None
                if index_key in f:
                    index = np.asarray(f[index_key]).astype(np.int16)
                elif legacy_key in f and f[legacy_key].shape[1] == pcs.shape[1]:
                    index = np.asarray(f[legacy_key]).astype(np.int16)
            if index is None:
                index = index_k_neighbours(pcs, k).astype(np.int16)
                try:
                    with h5py.File(h5_name, 'r+') as f:
                        f.create_dataset(index_key, data=index)
                except (OSError, ValueError) as e:  # read-only dir / concurrent writer
                    logger.warning('could not cache %s in %s: %s', index_key, h5_name, e)
            pcd_list.append(pcs)
            idx_list.append(index)
            label_list.append(labels)
        if not pcd_list:
            raise FileNotFoundError(f'No h5 files matching {wild} under {path}')
        return (
            np.concatenate(pcd_list),
            np.concatenate(idx_list),
            np.concatenate(label_list).ravel(),
        )
