"""Dataset IO: big-ANN binary files via the native mmap reader.

Formats (big-ann-benchmarks layout, as consumed by cuvs_bench —
/root/reference/cpp/bench/ann/src/common/blob.hpp):
  .fbin (float32), .ibin (int32), .u8bin (uint8), .i8bin (int8):
  [int32 n_rows][int32 dim][payload].

The C++ backend (native/dataset_io.cpp, built to libcuvs_tpu_native.so)
provides mmap + threaded strided reads; a pure-numpy mmap fallback keeps
everything working when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_DTYPES = {
    ".fbin": np.float32,
    ".ibin": np.int32,
    ".u8bin": np.uint8,
    ".i8bin": np.int8,
}

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.join(os.path.dirname(__file__), "libcuvs_tpu_native.so")
    if not os.path.exists(path):
        _lib = False
        return _lib
    lib = ctypes.CDLL(path)
    lib.cuvs_tpu_open_bin.restype = ctypes.c_void_p
    lib.cuvs_tpu_open_bin.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.cuvs_tpu_bin_rows.restype = ctypes.c_int32
    lib.cuvs_tpu_bin_rows.argtypes = [ctypes.c_void_p]
    lib.cuvs_tpu_bin_dim.restype = ctypes.c_int32
    lib.cuvs_tpu_bin_dim.argtypes = [ctypes.c_void_p]
    lib.cuvs_tpu_bin_data.restype = ctypes.c_void_p
    lib.cuvs_tpu_bin_data.argtypes = [ctypes.c_void_p]
    lib.cuvs_tpu_close_bin.argtypes = [ctypes.c_void_p]
    lib.cuvs_tpu_read_rows.restype = ctypes.c_int
    lib.cuvs_tpu_read_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.cuvs_tpu_write_bin.restype = ctypes.c_int
    lib.cuvs_tpu_write_bin.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return bool(_load_lib())


def _dtype_for(path: str):
    for ext, dt in _DTYPES.items():
        if path.endswith(ext):
            return np.dtype(dt)
    raise ValueError(f"unknown dataset extension: {path}")


class BinDataset:
    """Memory-mapped dataset with batched row reads."""

    def __init__(self, path: str):
        self.path = path
        self.dtype = _dtype_for(path)
        lib = _load_lib()
        self._h = None
        if lib:
            h = lib.cuvs_tpu_open_bin(path.encode(), self.dtype.itemsize)
            if not h:
                raise OSError(f"failed to open {path}")
            self._h = h
            self._lib = lib
            self.n_rows = lib.cuvs_tpu_bin_rows(h)
            self.dim = lib.cuvs_tpu_bin_dim(h)
        else:
            header = np.fromfile(path, np.int32, 2)
            self.n_rows, self.dim = int(header[0]), int(header[1])
            self._mm = np.memmap(
                path, self.dtype, mode="r", offset=8, shape=(self.n_rows, self.dim)
            )

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.dim)

    def read(self, start: int = 0, count: Optional[int] = None, n_threads: int = 4):
        """Copy rows [start, start+count) into a fresh array."""
        if count is None:
            count = self.n_rows - start
        if start < 0 or start + count > self.n_rows:
            raise IndexError("row range out of bounds")
        if self._h is not None:
            out = np.empty((count, self.dim), self.dtype)
            rc = self._lib.cuvs_tpu_read_rows(
                self._h, start, count, out.ctypes.data_as(ctypes.c_void_p), n_threads
            )
            if rc != 0:
                raise OSError("native read failed")
            return out
        return np.array(self._mm[start : start + count])

    def batches(self, batch_size: int):
        for s in range(0, self.n_rows, batch_size):
            yield self.read(s, min(batch_size, self.n_rows - s))

    def close(self):
        if self._h is not None:
            self._lib.cuvs_tpu_close_bin(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def load_bin(path: str) -> np.ndarray:
    """Read a whole .bin dataset into memory."""
    with BinDataset(path) as d:
        return d.read()


def write_bin(path: str, array) -> None:
    """Write a big-ann .bin file (dtype from the extension)."""
    array = np.ascontiguousarray(array, _dtype_for(path))
    lib = _load_lib()
    if lib:
        rc = lib.cuvs_tpu_write_bin(
            path.encode(),
            array.ctypes.data_as(ctypes.c_void_p),
            array.shape[0],
            array.shape[1],
            array.dtype.itemsize,
        )
        if rc != 0:
            raise OSError(f"failed to write {path}")
        return
    with open(path, "wb") as f:
        np.asarray(array.shape, np.int32).tofile(f)
        array.tofile(f)
