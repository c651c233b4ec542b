"""Batching data loader for numpy-backed point-cloud datasets.

Native replacement for the drytorch ``DataLoader`` surface used by the
reference (train_autoencoder.py:34-39).  Datasets expose ``__len__`` plus
either ``__getitem__`` (per sample) or ``__getitems__`` (batched, used by the
derived datasets in :mod:`pccf.data.processed`).  Batches are stacked numpy
structures ready for ``jax.device_put`` by the runner.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from pccf.data.structures import Inputs, Targets


# ---------------------------------------------------------------- workers
# One dataset copy lives in each worker process (shipped once through the
# pool initializer); tasks carry only index lists.  Workers never touch the
# accelerator: only datasets whose item path is pure numpy opt in via
# ``supports_workers`` (pccf.data.protocols.PointCloudDataset).
_WORKER_DATASET: Any = None


def _worker_init(dataset: Any) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_fetch(task: tuple[list[int], bool, tuple[int, ...]]) -> tuple[Any, Any]:
    idx_list, inference, rng_key = task
    ds = _WORKER_DATASET
    if hasattr(ds, 'rng'):
        # deterministic per (seed, epoch, batch) regardless of which worker
        # runs the task (and of n_workers), like a per-sample torch generator
        ds.rng = np.random.default_rng(rng_key)
    if hasattr(ds, 'set_inference'):
        ds.set_inference(inference)
    getitems = getattr(ds, '__getitems__', None)
    items = getitems(idx_list) if getitems is not None else [ds[i] for i in idx_list]
    return _stack([it[0] for it in items]), _stack([it[1] for it in items])


def _stack(items: list[Any]) -> Any:
    """Stack a list of same-type (named)tuples / arrays / Nones leaf-wise."""
    first = items[0]
    if first is None:
        return None
    if isinstance(first, tuple) and hasattr(first, '_fields'):
        return type(first)(*(_stack([getattr(it, f) for it in items]) for f in first._fields))
    if np.isscalar(first) or (isinstance(first, np.ndarray) and first.ndim == 0):
        return np.asarray(items)
    return np.stack([np.asarray(it) for it in items])


class DataLoader:
    """Deterministic, seedable batching over a map-style dataset.

    Args:
        dataset: sized dataset returning ``(Inputs, Targets)``-like tuples.
        batch_size: per-host batch size (the global batch under pjit).
        n_workers: batch-assembly worker *processes* (reference
            train_autoencoder.py:34-39; default 0 = in-process with thread
            prefetch, user_settings.yaml:7).  Only datasets with a pure-numpy
            item path use workers (``supports_workers``); device-backed
            derived datasets always assemble in the main process.
        pin_memory: accepted for drytorch call-surface parity; a no-op here
            (host->device transfer is the runner's ``device_put``).
        seed: shuffle/augmentation seed; defaults to the dataset's own
            (user.seed-derived) seed.

    Tail behaviour is fixed per iterator: :meth:`epoch_iterator` drops the
    trailing partial batch (static jit shapes), :meth:`get_loader` keeps it.
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        n_workers: int = 0,
        pin_memory: bool = False,
        seed: int | None = None,
    ) -> None:
        del pin_memory
        self.dataset = dataset
        self.batch_size = batch_size
        # default to the dataset's own (user.seed-derived) seed, so shuffle
        # order and worker-side augmentation streams vary with user.seed even
        # though the entry points never pass a loader seed explicitly
        self.seed = int(seed) if seed is not None else int(getattr(dataset, 'seed', 0))
        self.n_workers = n_workers if getattr(dataset, 'supports_workers', False) else 0
        self._pool = None

    def _executor(self):
        if self._pool is None:
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            # spawn: no fork of a process that may hold an accelerator client
            self._pool = ProcessPoolExecutor(
                max_workers=self.n_workers,
                mp_context=multiprocessing.get_context('spawn'),
                initializer=_worker_init,
                initargs=(self.dataset,),
            )
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        return self.n_batches(inference=False)

    def n_batches(self, inference: bool = False) -> int:
        n = len(self.dataset)
        if inference:
            return (n + self.batch_size - 1) // self.batch_size
        full = n // self.batch_size
        if full == 0:
            # epoch_iterator would silently yield nothing: every "epoch"
            # would train zero steps while the epoch counter advances
            raise ValueError(
                f'dataset of {n} samples yields no training batches at '
                f'batch_size={self.batch_size}; lower the batch size'
            )
        return full

    def _fetch(
        self, idx_list: list[int], inference: bool, rng_key: tuple[int, ...] | None = None
    ) -> tuple[Any, Any]:
        if rng_key is not None and hasattr(self.dataset, 'rng'):
            # same per-(seed, epoch, batch) reseed as _worker_fetch, so the
            # augmentation stream is identical for n_workers=0 and >0 (and a
            # resumed run sees the same data as a continuous one)
            self.dataset.rng = np.random.default_rng(rng_key)
        if hasattr(self.dataset, 'set_inference'):
            self.dataset.set_inference(inference)
        getitems = getattr(self.dataset, '__getitems__', None)
        if getitems is not None:
            items = getitems(idx_list)
        else:
            items = [self.dataset[i] for i in idx_list]
        inputs = _stack([it[0] for it in items])
        targets = _stack([it[1] for it in items])
        return inputs, targets

    def epoch_iterator(
        self, epoch: int, shuffle: bool = True, prefetch: int = 2
    ) -> Iterator[tuple[Inputs, Targets]]:
        """Training iterator: shuffled by (seed, epoch), drops the tail.

        Batch assembly runs in a background thread ``prefetch`` batches ahead
        so host-side data work (native resampler, augmentation) overlaps the
        device step."""
        n = len(self.dataset)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        batches = [
            list(map(int, order[b * self.batch_size : (b + 1) * self.batch_size]))
            for b in range(n // self.batch_size)
        ]
        if self.n_workers > 0:
            # Bounded sliding window of in-flight futures: workers run at most
            # ``prefetch + n_workers`` batches ahead of the consumer, so an
            # epoch's worth of assembled batches never buffers in the parent.
            from collections import deque

            pool = self._executor()
            depth = max(prefetch, 1) + self.n_workers
            pending: deque = deque()
            for bi, idx in enumerate(batches):
                pending.append(
                    pool.submit(_worker_fetch, (idx, False, (self.seed, epoch, bi)))
                )
                if len(pending) >= depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
            return
        if prefetch <= 0 or len(batches) <= 1:
            for bi, idx in enumerate(batches):
                yield self._fetch(idx, inference=False, rng_key=(self.seed, epoch, bi))
            return
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # stop-aware put: a consumer that abandons the iterator mid-epoch
            # sets ``stop`` from its finally block, and the producer must not
            # stay blocked in q.put() forever (thread + batch memory leak)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for bi, idx in enumerate(batches):
                    if stop.is_set():
                        return
                    if not put(self._fetch(idx, inference=False, rng_key=(self.seed, epoch, bi))):
                        return
            except Exception as e:  # surface loader errors to the consumer
                put(e)
            finally:
                put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def get_loader(self, inference: bool = True) -> Iterator[tuple[Inputs, Targets]]:
        """Evaluation iterator: sequential, includes the trailing partial batch."""
        n = len(self.dataset)
        for b in range(0, n, self.batch_size):
            idx = list(range(b, min(b + self.batch_size, n)))
            yield self._fetch(idx, inference=inference)


def take_from_dataset(dataset: Any, num_samples: int, inference: bool = True) -> tuple[Any, Any]:
    """First ``num_samples`` items stacked into one batch (drytorch
    ``take_from_dataset`` parity; used by the reconstruction-logging hooks)."""
    if hasattr(dataset, 'set_inference'):
        dataset.set_inference(inference)
    items = [dataset[i] for i in range(min(num_samples, len(dataset)))]
    return _stack([it[0] for it in items]), _stack([it[1] for it in items])
