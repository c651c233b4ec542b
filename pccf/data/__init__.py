"""Data layer: structures, loaders, augmentations, derived datasets."""

from pccf.data.dataset import get_dataset, get_datasets
from pccf.data.protocols import Partitions, PointCloudDataset, Singleton, SplitCreator
from pccf.data.structures import Inputs, Outputs, Targets, WInputs, WTargets

IN_CHAN = 3
OUT_CHAN = 3

__all__ = [
    'IN_CHAN',
    'OUT_CHAN',
    'Inputs',
    'Outputs',
    'Partitions',
    'PointCloudDataset',
    'Singleton',
    'SplitCreator',
    'Targets',
    'WInputs',
    'WTargets',
    'get_dataset',
    'get_datasets',
]
