"""Dynamic batching: cross-request query aggregation for serving.

Reference: ``cuvs::neighbors::dynamic_batching``
(/root/reference/cpp/include/cuvs/neighbors/dynamic_batching.hpp:24-55 —
max_batch_size=100, n_queues=3, dispatch_timeout_ms, conservative
dispatch; impl cpp/src/neighbors/detail/dynamic_batching.cuh: lock-free
pinned-host ring buffer of batch tokens + cuda::atomic dispatch).

TPU-native: XLA owns the device stream, so the CUDA machinery (pinned
rings, persistent kernels) collapses to a host-side collector thread in
front of ONE jitted fixed-shape search: requests accumulate until
``max_batch_size`` rows or ``dispatch_timeout_ms`` elapse, are padded to
the static batch shape (so the jit never recompiles), searched in one
device call, and scattered back to per-request futures.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class BatchParams:
    """Mirrors dynamic_batching::index_params (dynamic_batching.hpp:24-55)."""

    k: int = 10
    max_batch_size: int = 100
    dispatch_timeout_ms: float = 2.0
    conservative_dispatch: bool = False


class BatchedSearcher:
    """Wraps any (index, search_fn) in a request-aggregating queue.

    search_fn(queries [B, d]) -> (dists [B, k], ids [B, k]) must accept the
    fixed batch shape; ``submit`` returns a Future per request.
    """

    def __init__(self, search_fn: Callable, dim: int, params: BatchParams = BatchParams()):
        self.search_fn = search_fn
        self.params = params
        self.dim = dim
        self._lock = threading.Condition()
        self._pending: List[Tuple[np.ndarray, Future]] = []
        self._rows = 0
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, queries) -> Future:
        """Enqueue [m, d] queries; resolves to (dists [m,k], ids [m,k])."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        if queries.shape[1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {queries.shape[1]}")
        fut = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("searcher closed")
            self._pending.append((queries, fut))
            self._rows += queries.shape[0]
            self._lock.notify()
        return fut

    def search(self, queries, timeout: Optional[float] = 30.0):
        """Blocking convenience wrapper."""
        return self.submit(queries).result(timeout=timeout)

    def _run(self):
        timeout_s = self.params.dispatch_timeout_ms / 1000.0
        B = self.params.max_batch_size
        while True:
            with self._lock:
                if not self._pending:
                    self._lock.wait(timeout=0.1)
                    if self._closed and not self._pending:
                        return
                    continue
                deadline = time.monotonic() + timeout_s
                while self._rows < B and time.monotonic() < deadline:
                    self._lock.wait(timeout=max(0.0, deadline - time.monotonic()))
                batch = self._pending
                self._pending = []
                self._rows = 0
            self._dispatch(batch, B)

    def _dispatch(self, batch, B):
        try:
            qs = np.concatenate([q for q, _ in batch], axis=0)
            k = self.params.k
            outs_d, outs_i = [], []
            for s in range(0, qs.shape[0], B):
                block = qs[s : s + B]
                padded = block
                if block.shape[0] < B:  # keep the jitted shape fixed
                    padded = np.concatenate(
                        [block, np.zeros((B - block.shape[0], self.dim), np.float32)]
                    )
                d, i = self.search_fn(padded)
                outs_d.append(np.asarray(d)[: block.shape[0]])
                outs_i.append(np.asarray(i)[: block.shape[0]])
            all_d = np.concatenate(outs_d, axis=0)
            all_i = np.concatenate(outs_i, axis=0)
            off = 0
            for q, fut in batch:
                m = q.shape[0]
                fut.set_result((all_d[off : off + m], all_i[off : off + m]))
                off += m
        except Exception as e:  # propagate to every waiter
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)

    def close(self):
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._worker.join(timeout=5.0)


def wrap(module, index, dim: int, params: BatchParams = BatchParams(), **search_kw) -> BatchedSearcher:
    """Build a BatchedSearcher over any index module (the ``dynamic_batching::
    index`` analog: wraps an upstream index)."""

    def fn(queries):
        return module.search(index, queries, params.k, **search_kw)

    return BatchedSearcher(fn, dim, params)
