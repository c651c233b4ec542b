"""Host-side input-pipeline throughput probe (CPU-only, no accelerator).

Measures batch-assembly rates for the ModelNet training path at flagship
shapes (2048-point pool, 2048 input points, resample + jitter + rotation +
scale/translation — the config-2/4 augmentation set, reference
src/data/modelnet.py:30-60 + src/data/augmentations.py):

- native C++ assembler (pccf/native/cloud_sampler.cpp) via ``__getitems__``
- pure-Python per-item fallback via ``__getitem__``
- DataLoader end-to-end epoch at n_workers = 0 (thread prefetch) / 2 / 4

The number that matters: items/s vs what the device consumes.  Flagship
stage-1 training steps were ~30-35 ms for batch 16 on v5e (BASELINE.md), so
the pipeline must sustain >~530 items/s to keep the chip fed.

Usage: python _host_pipeline_probe.py
"""

import os
import time
import types

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np

from pccf.data.modelnet import ModelNet40Split
from pccf.train.loader import DataLoader

POOL, N_IN, N_ITEMS, BATCH = 2048, 2048, 1024, 16

cfg_data = types.SimpleNamespace(
    n_input_points=N_IN,
    resample=True,
    rotate=True,
    translate=True,
    jitter_sigma=0.01,
    jitter_clip=0.02,
)

rng = np.random.default_rng(0)
pcd = rng.standard_normal((N_ITEMS, POOL, 3)).astype(np.float32)
indices = np.zeros((N_ITEMS, 1, 1), np.int32)  # unused on the training path
labels = rng.integers(0, 40, N_ITEMS)


def make_split():
    ds = ModelNet40Split(pcd, indices, labels, cfg_data, seed=0)
    ds.set_inference(False)
    return ds


def timeit(label, fn, n_items, repeats=3):
    best = min(fn() for _ in range(repeats))
    print(f'{label:40s} {best:6.3f} s  {n_items / best:8.0f} items/s', flush=True)
    return n_items / best


def run_batched(ds):
    def go():
        t0 = time.perf_counter()
        for b in range(0, N_ITEMS, BATCH):
            ds.__getitems__(list(range(b, b + BATCH)))
        return time.perf_counter() - t0

    return go


def run_python(ds):
    # defeat the native fast path by making the import-level dispatch miss
    def go():
        t0 = time.perf_counter()
        for i in range(N_ITEMS):
            ds[i]
        return time.perf_counter() - t0

    return go


def run_loader(ds, n_workers):
    loader = DataLoader(ds, batch_size=BATCH, n_workers=n_workers)
    def go():
        t0 = time.perf_counter()
        n = 0
        for inputs, _targets in loader.epoch_iterator(epoch=1):
            n += inputs.cloud.shape[0]
        assert n == N_ITEMS
        return time.perf_counter() - t0

    try:
        return min(go() for _ in range(3))
    finally:
        loader.close()


def main():
    ds = make_split()
    # confirm the native path actually engages
    from pccf import native

    engaged = native.assemble_batch_aug(
        pcd, np.arange(4, dtype=np.int64), N_IN, seed=1,
        jitter_sigma=0.01, jitter_clip=0.02, resample=True, rotate=True, translate=True,
    ) is not None
    print(f'native assembler engaged: {engaged}', flush=True)

    timeit('native __getitems__ (batch 16)', run_batched(ds), N_ITEMS)
    timeit('python __getitem__ per item', run_python(ds), N_ITEMS)
    for w in (0, 2, 4):
        best = run_loader(make_split(), w)
        print(
            f'{"DataLoader epoch n_workers=" + str(w):40s} {best:6.3f} s  '
            f'{N_ITEMS / best:8.0f} items/s',
            flush=True,
        )
    print('HOST PIPELINE PROBE DONE', flush=True)


if __name__ == '__main__':
    main()
