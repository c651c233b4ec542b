"""Dataset getters (reference src/data/dataset.py).

The reference staggers dataset construction across DDP ranks behind barriers
(dataset.py:37-54); under single-program pjit there is one process per host,
so construction is just per-host (multi-host barriers via multihost_utils
when needed).
"""

from __future__ import annotations

from pccf.config.options import Datasets
from pccf.data.protocols import Partitions, PointCloudDataset


def get_dataset(cfg, partition: Partitions) -> PointCloudDataset:
    """Build (or fetch the cached) split creator and return the partition."""
    from pccf.data.modelnet import ModelNet40Dataset
    from pccf.data.shapenet import ShapeNetDatasetFlow
    from pccf.data.synthetic import SyntheticDataset

    cfg.user.path.data_dir.mkdir(parents=True, exist_ok=True)
    registry = {
        Datasets.ModelNet: ModelNet40Dataset,
        Datasets.ShapenetFlow: ShapeNetDatasetFlow,
        Datasets.Synthetic: SyntheticDataset,
    }
    return registry[cfg.data.dataset.name](cfg).split(partition)


def get_datasets(cfg) -> tuple[PointCloudDataset, PointCloudDataset]:
    """(train, eval) pair with the ``final`` switch (dataset.py:29-34):
    final=True trains on train+val and evaluates on test."""
    train = get_dataset(cfg, Partitions.train_val if cfg.final else Partitions.train)
    test = get_dataset(cfg, Partitions.test if cfg.final else Partitions.val)
    return train, test
