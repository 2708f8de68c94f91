"""Competitor algorithm wrappers for the benchmark harness.

Reference analog: cpp/bench/ann/src/{hnswlib,faiss,diskann,ggnn}/ — the
reference links external libraries as competitor rows. None of those are
installable in this offline image (checked: hnswlib/faiss do not import,
and hnswlib's source is CMake-fetched, not vendored), so the CPU HNSW
competitor here is an independent C++ implementation of the HNSW
algorithm (native/hnsw_baseline.cpp) driven over the same datasets and
recall methodology as the cuvs_tpu contenders.
"""

from __future__ import annotations

import ctypes
import os
import time
from typing import Optional, Tuple

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "io", "libcuvs_tpu_native.so",
        )
        _LIB = ctypes.CDLL(path)
        _LIB.hnswb_build.restype = ctypes.c_void_p
        _LIB.hnswb_build.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ]
        _LIB.hnswb_search.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB.hnswb_free.argtypes = [ctypes.c_void_p]
    return _LIB


class HnswCpu:
    """CPU HNSW competitor (single-thread, L2/IP)."""

    def __init__(self, M: int = 16, ef_construction: int = 200,
                 metric: str = "sqeuclidean", seed: int = 0):
        self.M = M
        self.efc = ef_construction
        self.ip = metric in ("inner_product", "ip")
        self.seed = seed
        self._h = None
        self.build_seconds = None

    def build(self, dataset: np.ndarray) -> "HnswCpu":
        x = np.ascontiguousarray(dataset, np.float32)
        t0 = time.time()
        self._h = _lib().hnswb_build(
            x.ctypes.data_as(ctypes.c_void_p), x.shape[0], x.shape[1],
            self.M, self.efc, int(self.ip), self.seed,
        )
        self.build_seconds = time.time() - t0
        return self

    def search(self, queries: np.ndarray, k: int, ef: int = 64
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, np.float32)
        nq = q.shape[0]
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        _lib().hnswb_search(
            self._h, q.ctypes.data_as(ctypes.c_void_p), nq, k, max(ef, k),
            out_i.ctypes.data_as(ctypes.c_void_p),
            out_d.ctypes.data_as(ctypes.c_void_p),
        )
        return out_d, out_i

    def __del__(self):
        if self._h is not None:
            try:
                _lib().hnswb_free(self._h)
            except Exception:  # noqa: BLE001
                pass
