"""Derived datasets that run trained models to synthesise samples.

Reference: src/data/processed.py (WDatasetEncoder, WDatasetWithLogits,
DoubleReconstructedDataset*, CounterfactualDatasetEncoder, BoundaryDataset).

TPU redesign: the model passes run as **jitted chunked batches** (max_batch
64, processed.py:27) on device; augmentation noise is redrawn on every
``__getitems__`` call, preserving the reference's fresh-samples-per-epoch
behaviour (processed.py:79-87).  ``*Frozen`` precomputes one pass.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np

from pccf.data.structures import Inputs, Targets, WInputs, WTargets
from pccf.train.model import Model

Array = jax.Array


def _collate_base(dataset, idx_list: Sequence[int]) -> tuple[np.ndarray, np.ndarray | None, np.ndarray]:
    clouds, indices, labels = [], [], []
    for i in idx_list:
        inputs, targets = dataset[int(i)]
        clouds.append(np.asarray(inputs.cloud))
        indices.append(None if inputs.indices is None else np.asarray(inputs.indices))
        labels.append(np.int64(targets.label))
    cloud = np.stack(clouds)
    missing = sum(ix is None for ix in indices)
    if 0 < missing < len(indices):
        # deciding from item 0 alone would either silently drop the real
        # kNN indices (first None) or crash np.stack opaquely (first present)
        raise ValueError(
            f'backing dataset returned kNN indices for {len(indices) - missing} '
            f'of {len(indices)} items; all or none must provide them'
        )
    idx = None if missing else np.stack(indices)
    return cloud, idx, np.asarray(labels)


class ProcessedDataset:
    """Base: chunked device passes over a backing dataset (processed.py:25-61)."""

    max_batch: int = 64
    # item assembly runs jitted device passes — must stay in the main process
    supports_workers: bool = False

    def __init__(self, dataset: Any, autoencoder: Model) -> None:
        self.dataset = dataset
        self.autoencoder = autoencoder
        self.dataset_len = len(dataset)
        self._jitted: dict[str, Any] = {}
        self._base_key = jax.random.key(int(getattr(dataset, 'seed', 0)))
        self._draws = 0

    def _next_key(self) -> Array:
        """Fresh sampling key per device pass: the stochastic derived
        datasets must redraw CVAE sampling noise on every ``__getitems__``
        chunk (reference processed.py:79-87 consumes torch's global RNG), or
        every epoch would silently see identical latent noise like the
        *Frozen* variants.  Keys are traced jit arguments — no recompiles."""
        self._draws += 1
        return jax.random.fold_in(self._base_key, self._draws)

    def __len__(self) -> int:
        return self.dataset_len

    def __getitem__(self, i: int):
        """Per-item access for protocol consumers (take_from_dataset, the
        reconstruction hooks); the batched ``__getitems__`` stays the fast
        path used by the loader."""
        return self.__getitems__([int(i)])[0]

    def set_inference(self, inference: bool) -> None:
        if hasattr(self.dataset, 'set_inference'):
            self.dataset.set_inference(inference)

    def _chunks(self, idx_list: Sequence[int]):
        cloud, idx, labels = _collate_base(self.dataset, idx_list)
        for i in range(0, len(idx_list), self.max_batch):
            sl = slice(i, i + self.max_batch)
            yield Inputs(
                cloud=cloud[sl], indices=None if idx is None else idx[sl]
            ), labels[sl]

    def _jit(self, name: str, fn):
        if name not in self._jitted:
            self._jitted[name] = jax.jit(fn)
        return self._jitted[name]


class _ClassifierMixin:
    classifier: Model

    def _logits(self, inputs: Inputs) -> Array:
        fn = self._jit(
            'classifier',
            lambda variables, inp: self.classifier.module.apply(variables, inp, train=False),
        )
        return fn(self.classifier.variables, inputs)


class WDatasetEncoder(ProcessedDataset):
    """(WInputs, WTargets) via the frozen encoder+quantizer (processed.py:74-95)."""

    def _encode(self, inputs: Inputs):
        fn = self._jit(
            'encode',
            lambda variables, inp: self.autoencoder.module.apply(
                variables, inp, train=False, method='encode_quantize'
            ),
        )
        return fn(self.autoencoder.variables, inputs)

    def __getitems__(self, idx_list: Sequence[int]) -> list[tuple[WInputs, WTargets]]:
        out: list[tuple[WInputs, WTargets]] = []
        for inputs, _labels in self._chunks(idx_list):
            data = jax.device_get(self._encode(inputs))
            for w_q, w_e, one_hot in zip(data.w_q, data.w_e, data.one_hot_idx):
                out.append((WInputs(w_q), WTargets(w_e=w_e, one_hot_idx=one_hot)))
        return out


class WDatasetWithLogits(WDatasetEncoder, _ClassifierMixin):
    """Adds classifier logits for the conditional CVAE (processed.py:98-124)."""

    def __init__(self, dataset: Any, autoencoder: Model, classifier: Model) -> None:
        super().__init__(dataset, autoencoder)
        self.classifier = classifier

    def __getitems__(self, idx_list: Sequence[int]) -> list[tuple[WInputs, WTargets]]:
        out: list[tuple[WInputs, WTargets]] = []
        for inputs, _labels in self._chunks(idx_list):
            # dispatch both device passes before fetching either: the
            # classifier pass overlaps the encode transfer
            encoded = self._encode(inputs)
            logits_dev = self._logits(inputs)
            data = jax.device_get(encoded)
            logits = np.asarray(jax.device_get(logits_dev))
            for w_q, w_e, logit, one_hot in zip(data.w_q, data.w_e, logits, data.one_hot_idx):
                out.append((WInputs(w_q, logit), WTargets(w_e=w_e, one_hot_idx=one_hot, logits=logit)))
        return out


class WDatasetWithLogitsFrozen(WDatasetWithLogits):
    """One-shot precompute variant (processed.py:127-147)."""

    def __init__(self, dataset: Any, autoencoder: Model, classifier: Model) -> None:
        super().__init__(dataset, autoencoder, classifier)
        self._frozen = WDatasetWithLogits.__getitems__(self, list(range(len(self))))

    def __getitems__(self, idx_list: Sequence[int]) -> list[tuple[WInputs, WTargets]]:
        return [self._frozen[int(i)] for i in idx_list]


class DoubleReconstructedDatasetEncoder(ProcessedDataset):
    """Reconstructions after the inner-CVAE roundtrip (processed.py:150-172)."""

    def _reconstruct(self, inputs: Inputs):
        fn = self._jit(
            'double',
            lambda variables, inp, rng: self.autoencoder.module.apply(
                variables, inp, method='double_reconstruct', rngs={'sampling': rng}
            ),
        )
        return fn(self.autoencoder.variables, inputs, self._next_key())

    def __getitems__(self, idx_list: Sequence[int]) -> list[tuple[Inputs, Targets]]:
        out = []
        for inputs, labels in self._chunks(idx_list):
            recon = np.asarray(jax.device_get(self._reconstruct(inputs).recon))
            for rec, label in zip(recon, labels):
                out.append((Inputs(cloud=rec), Targets(ref_cloud=rec, label=label)))
        return out


class DoubleReconstructedDatasetWithLogits(ProcessedDataset, _ClassifierMixin):
    """Conditional double reconstruction (processed.py:175-208)."""

    def __init__(self, dataset: Any, autoencoder: Model, classifier: Model) -> None:
        super().__init__(dataset, autoencoder)
        self.classifier = classifier

    def _reconstruct(self, inputs: Inputs, logits: Array):
        fn = self._jit(
            'double_logits',
            lambda variables, inp, lg, rng: self.autoencoder.module.apply(
                variables, inp, lg, method='double_reconstruct_with_logits', rngs={'sampling': rng}
            ),
        )
        return fn(self.autoencoder.variables, inputs, logits, self._next_key())

    def __getitems__(self, idx_list: Sequence[int]) -> list[tuple[Inputs, Targets]]:
        out = []
        for inputs, labels in self._chunks(idx_list):
            logits = self._logits(inputs)
            recon = np.asarray(jax.device_get(self._reconstruct(inputs, logits).recon))
            for rec, label in zip(recon, labels):
                out.append((Inputs(cloud=rec), Targets(ref_cloud=rec, label=label)))
        return out


class CounterfactualDatasetEncoder(ProcessedDataset, _ClassifierMixin):
    """Counterfactual clouds towards a target class (processed.py:211-260)."""

    def __init__(
        self,
        dataset: Any,
        autoencoder: Model,
        classifier: Model,
        target_dim: int,
        target_value: float = 1.0,
    ) -> None:
        super().__init__(dataset, autoencoder)
        self.classifier = classifier
        self.target_dim = target_dim
        self.target_value = target_value

    def _counterfactual(self, inputs: Inputs, logits: Array):
        fn = self._jit(
            'cf',
            lambda variables, inp, lg, td, tv, rng: self.autoencoder.module.apply(
                variables, inp, lg, td, tv, method='generate_counterfactual', rngs={'sampling': rng}
            ),
        )
        return fn(
            self.autoencoder.variables,
            inputs,
            logits,
            np.int32(self.target_dim),
            np.float32(self.target_value),
            self._next_key(),
        )

    def __getitems__(self, idx_list: Sequence[int]) -> list[tuple[Inputs, Targets]]:
        out = []
        for inputs, labels in self._chunks(idx_list):
            logits = self._logits(inputs)
            recon = np.asarray(jax.device_get(self._counterfactual(inputs, logits).recon))
            target = np.int64(self.target_dim)
            for rec, _label in zip(recon, labels):
                out.append((Inputs(cloud=rec), Targets(ref_cloud=rec, label=target)))
        return out


class BoundaryDataset(CounterfactualDatasetEncoder):
    """Neutral-conditioning variant, target_value=0 (processed.py:263-279)."""

    def __init__(self, dataset: Any, autoencoder: Model, classifier: Model, target_dim: int = 0):
        super().__init__(dataset, autoencoder, classifier, target_dim, target_value=0.0)
