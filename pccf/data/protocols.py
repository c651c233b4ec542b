"""Dataset protocols: partitions and split creators (reference src/data/protocols.py)."""

from __future__ import annotations

import abc
import enum
from typing import Any, ClassVar


class Partitions(enum.Enum):
    train = enum.auto()
    train_val = enum.auto()
    val = enum.auto()
    test = enum.auto()


# single module-level registry: rebinding a metaclass attribute from a
# subclass-bound classmethod (e.g. ModelNet40Dataset.reset_all()) would
# create a shadowing dict on AbstractSingleton and make later
# Singleton.reset_all() calls silently ineffective
_SINGLETON_INSTANCES: dict[type, Any] = {}


class Singleton(type):
    """One instance per class (reference protocols.py:30-38) — split creators
    load raw data once per process."""

    _instances: ClassVar[dict[type, Any]] = _SINGLETON_INSTANCES

    def __call__(cls, *args, **kwargs):
        if cls not in _SINGLETON_INSTANCES:
            _SINGLETON_INSTANCES[cls] = super().__call__(*args, **kwargs)
        return _SINGLETON_INSTANCES[cls]

    @classmethod
    def reset_all(mcs) -> None:
        _SINGLETON_INSTANCES.clear()


class AbstractSingleton(Singleton, abc.ABCMeta):
    pass


class PointCloudDataset(abc.ABC):
    """Map-style dataset of (Inputs, Targets); supports an inference-mode
    toggle replacing the reference's ``torch.is_inference_mode_enabled``
    switch (modelnet.py:42)."""

    inference: bool = False
    # raw splits are numpy-only in the item path, so DataLoader may farm
    # batch assembly out to worker processes; device-backed datasets
    # (pccf.data.processed) override this to stay in-process
    supports_workers: bool = True

    def set_inference(self, inference: bool) -> None:
        self.inference = inference

    @abc.abstractmethod
    def __len__(self) -> int: ...

    @abc.abstractmethod
    def __getitem__(self, index: int): ...


class SplitCreator(abc.ABC, metaclass=AbstractSingleton):
    """Loads a dataset once and produces partition views."""

    @abc.abstractmethod
    def split(self, split: Partitions) -> PointCloudDataset: ...
