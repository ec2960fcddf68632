"""ctypes bindings for the native C++ npy loader / prefetch pool.

Builds `deepfepe_tpu/native/npy_loader.cpp` on first use (g++, cached next
to the source) and exposes:

  - `load_npy(path)`            — synchronous single-file load
  - `BatchPrefetcher.submit/get`— async thread-pool batch loads

Falls back to numpy transparently when no compiler is available, so the
Python data pipeline never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "npy_loader.cpp"
_LIB = _NATIVE_DIR / "libnpy_loader.so"

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                str(_SRC), "-o", str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        _load_failed = True
        return None
    lib.nl_init.argtypes = [ctypes.c_int]
    lib.nl_probe.argtypes = [ctypes.c_char_p]
    lib.nl_probe.restype = ctypes.c_int64
    lib.nl_load.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_char),
    ]
    lib.nl_batch_submit.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int
    ]
    lib.nl_batch_submit.restype = ctypes.c_int64
    lib.nl_batch_nbytes.argtypes = [ctypes.c_int64, ctypes.c_int]
    lib.nl_batch_nbytes.restype = ctypes.c_int64
    lib.nl_batch_get.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_char),
    ]
    lib.nl_batch_free.argtypes = [ctypes.c_int64]
    lib.nl_init(max(os.cpu_count() // 2, 2))
    _lib = lib
    return _lib


def _dtype_of(kind: bytes, itemsize: int):
    k = kind.decode()
    return np.dtype(f"{k}{itemsize}")


def native_available() -> bool:
    return _get_lib() is not None


def load_npy(path: str) -> np.ndarray:
    """Load one .npy via the native lib (numpy fallback)."""
    lib = _get_lib()
    if lib is None:
        return np.load(path)
    nbytes = lib.nl_probe(path.encode())
    if nbytes < 0:
        raise IOError(f"nl_probe({path}) -> {nbytes}")
    buf = np.empty(nbytes, np.uint8)
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    itemsize = ctypes.c_int()
    kind = ctypes.c_char()
    st = lib.nl_load(
        path.encode(), buf.ctypes.data_as(ctypes.c_void_p), nbytes,
        shape, ctypes.byref(ndim), ctypes.byref(itemsize), ctypes.byref(kind),
    )
    if st != 0:
        raise IOError(f"nl_load({path}) -> {st}")
    dt = _dtype_of(kind.value, itemsize.value)
    shp = tuple(shape[i] for i in range(ndim.value))
    return buf.view(dt).reshape(shp)


class BatchPrefetcher:
    """Async batched loads over the native thread pool."""

    def __init__(self):
        self.lib = _get_lib()

    def submit(self, paths: List[str]) -> object:
        if self.lib is None:
            return [np.load(p) for p in paths]  # eager fallback
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        handle = self.lib.nl_batch_submit(arr, len(paths))
        return (handle, len(paths))

    def get(self, token) -> List[np.ndarray]:
        if self.lib is None:
            return token
        handle, n = token
        out = []
        for i in range(n):
            nbytes = self.lib.nl_batch_nbytes(handle, i)
            if nbytes < 0:
                raise IOError(f"batch item {i} failed: {nbytes}")
            buf = np.empty(nbytes, np.uint8)
            shape = (ctypes.c_int64 * 8)()
            ndim = ctypes.c_int()
            itemsize = ctypes.c_int()
            kind = ctypes.c_char()
            st = self.lib.nl_batch_get(
                handle, i, buf.ctypes.data_as(ctypes.c_void_p), nbytes,
                shape, ctypes.byref(ndim), ctypes.byref(itemsize),
                ctypes.byref(kind),
            )
            if st != 0:
                raise IOError(f"batch item {i} failed: {st}")
            dt = _dtype_of(kind.value, itemsize.value)
            shp = tuple(shape[j] for j in range(ndim.value))
            out.append(buf.view(dt).reshape(shp))
        self.lib.nl_batch_free(handle)
        return out
