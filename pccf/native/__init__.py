"""Native host-side runtime components (C++, ctypes-bound).

The compute path is Pallas/XLA on TPU; the host-side data pipeline — the one
part of the reference runtime that is genuinely host-bound — has a native
batch assembler (``cloud_sampler.cpp``): threaded resample + unit-sphere
normalise + clipped jitter with counter-based reproducible RNG.

Built on demand with g++; falls back to the numpy path when no compiler is
available.  Disable with ``PCCF_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib
import subprocess

import numpy as np

logger = logging.getLogger('pccf')

_DIR = pathlib.Path(__file__).resolve().parent
# version-suffixed: dlopen dedups by pathname, so a rebuilt library at the
# SAME path would return the stale in-process mapping — bump _ABI_VERSION
# whenever the C surface changes (keep in sync with pccf_native_version)
_ABI_VERSION = 2
_SO = _DIR / f'_cloudbatch_v{_ABI_VERSION}.so'
_SRC = _DIR / 'cloud_sampler.cpp'

_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-o', str(_SO), str(_SRC), '-lpthread'],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.info('native build failed (%s); using numpy data path', e)
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get('PCCF_NATIVE', '1') == '0':
        return None
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        if not _build():
            return None
        lib = ctypes.CDLL(str(_SO))
    if not hasattr(lib, 'pccf_assemble_batch_aug') or lib.pccf_native_version() != _ABI_VERSION:
        # a stale build at the versioned path (shouldn't happen, but a
        # crashed partial build could): fall back to the numpy data path
        logger.warning('native library at %s has the wrong ABI; using numpy data path', _SO)
        return None
    lib.pccf_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.pccf_assemble_batch.restype = None
    lib.pccf_assemble_batch_aug.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.pccf_assemble_batch_aug.restype = None
    _lib = lib
    return _lib


def assemble_batch(
    clouds: np.ndarray,
    item_ids: np.ndarray,
    n_out: int,
    seed: int,
    jitter_sigma: float = 0.0,
    jitter_clip: float = 0.0,
) -> np.ndarray | None:
    """Assemble a training batch natively: resample-with-replacement to
    ``n_out`` points, unit-sphere normalise, clipped jitter.

    Args:
        clouds: ``(n_items, n_src, 3)`` float32, contiguous.
        item_ids: ``(batch,)`` int64 indices into ``clouds``.
        n_out: points per output cloud.
        seed: batch seed (reproducible across runs for the same ids).

    Returns:
        ``(batch, n_out, 3)`` float32, or None when the native lib is absent.
    """
    lib = load()
    if lib is None:
        return None
    clouds = np.ascontiguousarray(clouds, np.float32)
    item_ids = np.ascontiguousarray(item_ids, np.int64)
    batch = item_ids.shape[0]
    out = np.empty((batch, n_out, 3), np.float32)
    lib.pccf_assemble_batch(
        clouds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        clouds.shape[0],
        clouds.shape[1],
        item_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        n_out,
        ctypes.c_uint64(seed & (2**64 - 1)),
        1 if jitter_sigma and jitter_clip else 0,
        float(jitter_sigma),
        float(jitter_clip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def assemble_batch_aug(
    clouds: np.ndarray,
    item_ids: np.ndarray,
    n_out: int,
    seed: int,
    jitter_sigma: float = 0.0,
    jitter_clip: float = 0.0,
    resample: bool = False,
    rotate: bool = False,
    translate: bool = False,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Assemble (input, reference) training batches with augmentations.

    Semantics match the python item path (pccf/data/modelnet.py:95-106):
    input = jitter(normalise(sample)); reference = ``normalise(full)[sample2]``
    when ``resample`` else the input; one shared rotation-about-y and
    per-axis scale/translation is applied to both clouds of a pair.

    Returns ``(cloud, ref)`` each ``(batch, n_out, 3)`` float32, or None
    when the native lib is absent.
    """
    lib = load()
    if lib is None:
        return None
    clouds = np.ascontiguousarray(clouds, np.float32)
    item_ids = np.ascontiguousarray(item_ids, np.int64)
    batch = item_ids.shape[0]
    out = np.empty((batch, n_out, 3), np.float32)
    ref = np.empty((batch, n_out, 3), np.float32)
    lib.pccf_assemble_batch_aug(
        clouds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        clouds.shape[0],
        clouds.shape[1],
        item_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        n_out,
        ctypes.c_uint64(seed & (2**64 - 1)),
        1 if jitter_sigma and jitter_clip else 0,
        float(jitter_sigma),
        float(jitter_clip),
        1 if resample else 0,
        1 if rotate else 0,
        1 if translate else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, ref
