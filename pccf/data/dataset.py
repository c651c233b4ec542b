"""Dataset getters (reference src/data/dataset.py).

The reference staggers dataset construction across DDP ranks behind barriers
(dataset.py:37-54) so rank 0 downloads/caches first.  The pjit analogue is
one process per *host*: on a multi-host slice, process 0 constructs the
split creator first (auto-download + kNN cache writeback hit disk exactly
once), the remaining hosts wait at a ``multihost_utils`` barrier and then
construct from the warm cache.  Split creators are process-level singletons
(protocols.Singleton), so repeated getters reuse the loaded data.
"""

from __future__ import annotations

from pccf.config.options import Datasets
from pccf.data.protocols import Partitions, PointCloudDataset


def _staggered_construct(creator_cls, cfg):
    """Rank-0-first construction with a global barrier on multi-host slices."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            creator_cls(cfg)  # warm disk caches; singleton retains the instance
        multihost_utils.sync_global_devices('pccf:dataset_construction')
    return creator_cls(cfg)


def get_dataset(cfg, partition: Partitions) -> PointCloudDataset:
    """Build (or fetch the cached singleton) split creator; return the partition."""
    from pccf.data.modelnet import ModelNet40Dataset
    from pccf.data.shapenet import ShapeNetDatasetFlow
    from pccf.data.synthetic import SyntheticDataset

    cfg.user.path.data_dir.mkdir(parents=True, exist_ok=True)
    registry = {
        Datasets.ModelNet: ModelNet40Dataset,
        Datasets.ShapenetFlow: ShapeNetDatasetFlow,
        Datasets.Synthetic: SyntheticDataset,
    }
    return _staggered_construct(registry[cfg.data.dataset.name], cfg).split(partition)


def get_datasets(cfg) -> tuple[PointCloudDataset, PointCloudDataset]:
    """(train, eval) pair with the ``final`` switch (dataset.py:29-34):
    final=True trains on train+val and evaluates on test."""
    train = get_dataset(cfg, Partitions.train_val if cfg.final else Partitions.train)
    test = get_dataset(cfg, Partitions.test if cfg.final else Partitions.val)
    return train, test
