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
_ABI_VERSION = 3
_SO = _DIR / f'_cloudbatch_v{_ABI_VERSION}.so'
_SRC = _DIR / 'cloud_sampler.cpp'

_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    """Compile to a per-process temp path, then atomically move into place:
    concurrent spawn workers can each build, but no process ever dlopens a
    partially-written .so."""
    tmp = _SO.with_suffix(f'.tmp{os.getpid()}.so')
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-o', str(tmp), str(_SRC), '-lpthread'],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _SO)  # atomic on POSIX
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.info('native build failed (%s); using numpy data path', e)
        tmp.unlink(missing_ok=True)
        return False


def _try_load(path: pathlib.Path) -> ctypes.CDLL | None:
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    if not hasattr(lib, 'pccf_assemble_batch_aug') or lib.pccf_native_version() != _ABI_VERSION:
        return None
    return lib


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get('PCCF_NATIVE', '1') == '0':
        return None
    lib = _try_load(_SO) if _SO.exists() else None
    if lib is None:
        # missing, unloadable, or wrong-ABI artifact: one rebuild attempt
        # (never crash — the numpy data path is the documented fallback)
        if not _build():
            return None
        lib = _try_load(_SO)
    if lib is None:
        logger.warning('native library at %s unusable after rebuild; using numpy data path', _SO)
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
    lib.pccf_assemble_batch.restype = ctypes.c_int
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
    lib.pccf_assemble_batch_aug.restype = ctypes.c_int
    _lib = lib
    return _lib


def _validate_arrays(clouds: np.ndarray, item_ids: np.ndarray) -> None:
    """Shape-check BEFORE the ctypes call: the C side only sees flat
    pointers plus the dims we pass, so a (n, m) or (n, m, 6) clouds array
    would read past the real buffer instead of erroring."""
    if clouds.ndim != 3 or clouds.shape[2] != 3:
        raise ValueError(f'clouds must be (n_items, n_src, 3) float32; got {clouds.shape}')
    if item_ids.ndim != 1:
        raise ValueError(f'item_ids must be 1-D; got shape {item_ids.shape}')


def _check_rc(rc: int, clouds: np.ndarray, item_ids: np.ndarray) -> None:
    if rc == 1:
        # item_ids is non-empty whenever rc==1, so plain min/max are safe —
        # an `initial=0` would report values no id actually has
        raise ValueError(
            f'item_ids out of range [0, {clouds.shape[0]}): '
            f'min={item_ids.min()}, max={item_ids.max()}'
        )
    if rc:
        raise ValueError(
            f'bad batch shapes: clouds {clouds.shape}, item_ids {item_ids.shape}'
        )


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
    _validate_arrays(clouds, item_ids)
    batch = item_ids.shape[0]
    out = np.empty((batch, n_out, 3), np.float32)
    rc = lib.pccf_assemble_batch(
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
    _check_rc(rc, clouds, item_ids)
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
    _validate_arrays(clouds, item_ids)
    batch = item_ids.shape[0]
    out = np.empty((batch, n_out, 3), np.float32)
    ref = np.empty((batch, n_out, 3), np.float32)
    rc = lib.pccf_assemble_batch_aug(
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
    _check_rc(rc, clouds, item_ids)
    return out, ref
