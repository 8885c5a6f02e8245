"""ctypes binding for the native .npy batch loader.

Builds ``libnpy_batch_loader.so`` on first use (g++, no external deps) and
exposes ``load_npy_batch(paths, item_shape) -> np.ndarray``: n float32 .npy
files read concurrently straight into one contiguous [n, *item_shape] batch
buffer, bypassing per-file np.load allocations and the GIL. Falls back to
numpy transparently when the toolchain or file dtype is unsupported, so the
python data path never hard-depends on the native library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_LIB_PATH = _NATIVE_DIR / "libnpy_batch_loader.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime
            < (_NATIVE_DIR / "npy_batch_loader.cpp").stat().st_mtime
        ):
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "-s"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.qa_tiger_load_npy_batch.restype = ctypes.c_int
        lib.qa_tiger_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


def load_npy_batch(paths: Sequence[str | os.PathLike],
                   item_shape: Sequence[int],
                   out: Optional[np.ndarray] = None,
                   num_threads: int = 4) -> np.ndarray:
    """Read ``len(paths)`` float32 .npy files into one [n, *item_shape] array.

    Files longer than the item (e.g. full 60-frame caches read at a lower
    frame count) are front-truncated like ``np.load(...)[:n]``. Falls back to
    numpy per-file loading on any unsupported input.
    """
    n = len(paths)
    item_shape = tuple(int(s) for s in item_shape)
    if out is None:
        out = np.empty((n, *item_shape), np.float32)
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.float32

    lib = _ensure_lib()
    if lib is not None and n:
        c_paths = (ctypes.c_char_p * n)(
            *[os.fsencode(str(p)) for p in paths])
        codes = (ctypes.c_int32 * n)()
        item_floats = int(np.prod(item_shape))
        rc = lib.qa_tiger_load_npy_batch(
            c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            item_floats, codes, num_threads)
        if rc == 0:
            return out
        # partial fallback: reload only the files the native path refused
        for i, code in enumerate(codes):
            if code != 0:
                arr = np.load(paths[i]).astype(np.float32)
                out[i] = arr.reshape(-1)[: item_floats].reshape(item_shape)
        return out

    for i, p in enumerate(paths):
        arr = np.load(p).astype(np.float32)
        out[i] = arr.reshape(-1)[: int(np.prod(item_shape))].reshape(item_shape)
    return out
