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
    """Mirrors dynamic_batching::index_params (dynamic_batching.hpp:24-55).

    ``auto_tune`` adapts the dispatch timeout from measured service
    latency (not in the reference, which exposes the raw knob only):
    waiting up to ``auto_tune_fraction`` of the observed median search
    time bounds the queueing-delay overhead at that fraction while
    letting the batch fill toward max_batch_size. If
    ``target_latency_ms`` is set the timeout additionally backs off
    whenever the rolling p95 end-to-end latency exceeds the target.
    """

    k: int = 10
    max_batch_size: int = 100
    dispatch_timeout_ms: float = 2.0
    conservative_dispatch: bool = False
    auto_tune: bool = False
    auto_tune_fraction: float = 0.5
    target_latency_ms: Optional[float] = None


class _TuneState:
    """Rolling latency stats + the adapted dispatch timeout (shared by
    both queue backends)."""

    def __init__(self, params: BatchParams):
        self.params = params
        self.timeout_s = params.dispatch_timeout_ms / 1000.0
        self._mu = threading.Lock()
        self._service: List[float] = []  # per-dispatch search seconds
        self._e2e: List[float] = []      # per-request end-to-end seconds

    def record(self, service_s: float, e2e: List[float]) -> None:
        with self._mu:
            self._service = (self._service + [service_s])[-64:]
            self._e2e = (self._e2e + e2e)[-512:]
            if not self.params.auto_tune:
                return
            med = float(np.median(self._service))
            t = self.params.auto_tune_fraction * med
            tgt = self.params.target_latency_ms
            if tgt is not None and len(self._e2e) >= 8:
                p95 = float(np.percentile(self._e2e, 95))
                if p95 > tgt / 1000.0:
                    t = min(t, self.timeout_s * 0.5)
            # clamp to sane bounds around the configured starting point:
            # never below 0.1 ms, never above 50x the configured timeout
            # (so a user-set long fill window is honored, not snapped to
            # a hardcoded cap)
            cfg = self.params.dispatch_timeout_ms / 1000.0
            lo = min(1e-4, cfg)
            hi = max(0.1, cfg * 50.0)
            self.timeout_s = float(np.clip(t, lo, hi))

    def stats(self) -> dict:
        with self._mu:
            e = np.asarray(self._e2e) * 1000.0
            s = np.asarray(self._service) * 1000.0
            return {
                "dispatch_timeout_ms": self.timeout_s * 1000.0,
                "n_requests": int(e.size),
                "latency_p50_ms": float(np.percentile(e, 50)) if e.size else None,
                "latency_p95_ms": float(np.percentile(e, 95)) if e.size else None,
                "service_p50_ms": float(np.percentile(s, 50)) if s.size else None,
            }


def _native_queue_lib():
    """The compiled MPSC queue (native/batch_queue.cpp) when built."""
    import ctypes
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "io", "libcuvs_tpu_native.so"
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.cuvs_tpu_queue_create.restype = ctypes.c_void_p
    lib.cuvs_tpu_queue_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.cuvs_tpu_queue_destroy.argtypes = [ctypes.c_void_p]
    lib.cuvs_tpu_queue_close.argtypes = [ctypes.c_void_p]
    lib.cuvs_tpu_queue_push.restype = ctypes.c_int64
    lib.cuvs_tpu_queue_push.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.cuvs_tpu_queue_pop_batch.restype = ctypes.c_int64
    lib.cuvs_tpu_queue_pop_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.cuvs_tpu_queue_size.restype = ctypes.c_int64
    lib.cuvs_tpu_queue_size.argtypes = [ctypes.c_void_p]
    return lib


class BatchedSearcher:
    """Wraps any (index, search_fn) in a request-aggregating queue.

    search_fn(queries [B, d]) -> (dists [B, k], ids [B, k]) must accept the
    fixed batch shape; ``submit`` returns a Future per request.

    ``backend``: "auto" uses the native MPSC ring (native/batch_queue.cpp,
    the reference's lock-free pinned ring analog) when the compiled
    library is present, else the Python condvar queue; "python"/"native"
    force one.
    """

    def __init__(self, search_fn: Callable, dim: int,
                 params: BatchParams = BatchParams(), backend: str = "auto"):
        self.search_fn = search_fn
        self.params = params
        self.dim = dim
        self._tune = _TuneState(params)
        self._lock = threading.Condition()
        self._pending: List[Tuple[np.ndarray, Future]] = []
        self._rows = 0
        self._closed = False
        self._native = None
        if backend in ("auto", "native"):
            lib = _native_queue_lib()
            if lib is not None:
                self._native = _NativeBackend(lib, search_fn, dim, params)
                return
            if backend == "native":
                raise RuntimeError(
                    "native queue not built (run make in native/)"
                )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, queries) -> Future:
        """Enqueue [m, d] queries; resolves to (dists [m,k], ids [m,k])."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        if queries.shape[1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {queries.shape[1]}")
        if self._native is not None:
            return self._native.submit(queries)
        fut = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("searcher closed")
            self._pending.append((queries, fut, time.monotonic()))
            self._rows += queries.shape[0]
            self._lock.notify()
        return fut

    def search(self, queries, timeout: Optional[float] = 30.0):
        """Blocking convenience wrapper."""
        return self.submit(queries).result(timeout=timeout)

    def _run(self):
        B = self.params.max_batch_size
        while True:
            with self._lock:
                if not self._pending:
                    self._lock.wait(timeout=0.1)
                    if self._closed and not self._pending:
                        return
                    continue
                deadline = time.monotonic() + self._tune.timeout_s
                while self._rows < B and time.monotonic() < deadline:
                    self._lock.wait(timeout=max(0.0, deadline - time.monotonic()))
                batch = self._pending
                self._pending = []
                self._rows = 0
            self._dispatch(batch, B)

    def _dispatch(self, batch, B):
        try:
            qs = np.concatenate([q for q, _, _ in batch], axis=0)
            k = self.params.k
            t0 = time.monotonic()
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
            service = time.monotonic() - t0
            all_d = np.concatenate(outs_d, axis=0)
            all_i = np.concatenate(outs_i, axis=0)
            off = 0
            now = time.monotonic()
            for q, fut, _ in batch:
                m = q.shape[0]
                fut.set_result((all_d[off : off + m], all_i[off : off + m]))
                off += m
            self._tune.record(service, [now - ts for _, _, ts in batch])
        except Exception as e:  # propagate to every waiter
            for _, fut, _ in batch:
                if not fut.done():
                    fut.set_exception(e)

    def stats(self) -> dict:
        """Rolling latency stats + the (auto-tuned) dispatch timeout."""
        tune = self._native._tune if self._native is not None else self._tune
        return tune.stats()

    def close(self):
        if self._native is not None:
            self._native.close()
            return
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._worker.join(timeout=5.0)


class _NativeBackend:
    """Dispatcher over the compiled MPSC ring (native/batch_queue.cpp):
    request threads push rows tagged with a ticket; one dispatcher pops a
    contiguous batch (capacity or dispatch-timeout), searches, and
    resolves futures as each ticket's rows complete."""

    def __init__(self, lib, search_fn, dim, params):
        import ctypes

        self._ct = ctypes
        self.lib = lib
        self.search_fn = search_fn
        self.dim = dim
        self.params = params
        self.q = lib.cuvs_tpu_queue_create(max(params.max_batch_size * 4, 512), dim)
        self._tune = _TuneState(params)
        self._mu = threading.Lock()
        self._next_ticket = 0
        self._inflight = {}  # ticket -> [n_rows, Future, rows_d, rows_i, filled]
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, queries) -> Future:
        ct = self._ct
        fut = Future()
        m, k = queries.shape[0], self.params.k
        with self._mu:
            if self._closed:
                raise RuntimeError("searcher closed")
            ticket = self._next_ticket
            self._next_ticket += 1
            self._inflight[ticket] = [
                m, fut, np.empty((m, k), np.float32), np.empty((m, k), np.int32),
                0, time.monotonic(),
            ]
        rows = np.ascontiguousarray(queries, np.float32)
        pushed = self.lib.cuvs_tpu_queue_push(
            self.q, rows.ctypes.data_as(ct.POINTER(ct.c_float)), m, ticket
        )
        if pushed != m:
            with self._mu:
                self._inflight.pop(ticket, None)
            fut.set_exception(RuntimeError("queue closed during push"))
        return fut

    def search(self, queries, timeout=30.0):
        return self.submit(queries).result(timeout=timeout)

    def _run(self):
        ct = self._ct
        B = self.params.max_batch_size
        k = self.params.k
        out = np.empty((B, self.dim), np.float32)
        tickets = np.empty(B, np.int64)
        while True:
            timeout_us = int(self._tune.timeout_s * 1e6)
            n = self.lib.cuvs_tpu_queue_pop_batch(
                self.q, out.ctypes.data_as(ct.POINTER(ct.c_float)),
                tickets.ctypes.data_as(ct.POINTER(ct.c_int64)), B, timeout_us,
            )
            if n == 0:
                if self._closed and self.lib.cuvs_tpu_queue_size(self.q) == 0:
                    return
                continue
            padded = out
            if n < B:  # keep the jitted shape fixed
                padded = out.copy()
                padded[n:] = 0.0
            try:
                t0 = time.monotonic()
                d, i = self.search_fn(padded)
                d = np.asarray(d)[:n]
                i = np.asarray(i)[:n]
                service = time.monotonic() - t0
                err = None
            except Exception as e:  # noqa: BLE001
                err = e
            done = []
            with self._mu:
                for r in range(n):
                    t = int(tickets[r])
                    ent = self._inflight.get(t)
                    if ent is None:
                        continue
                    if err is not None:
                        if not ent[1].done():
                            ent[1].set_exception(err)
                        self._inflight.pop(t, None)
                        continue
                    pos = ent[4]
                    ent[2][pos] = d[r]
                    ent[3][pos] = i[r]
                    ent[4] += 1
                    if ent[4] == ent[0]:
                        done.append((ent[1], ent[2], ent[3], ent[5]))
                        self._inflight.pop(t, None)
            now = time.monotonic()
            for fut, dd, ii, _ in done:
                fut.set_result((dd, ii))
            if err is None and done:
                self._tune.record(service, [now - ts for _, _, _, ts in done])

    def close(self):
        with self._mu:
            self._closed = True
        self.lib.cuvs_tpu_queue_close(self.q)
        self._worker.join(timeout=5.0)
        self.lib.cuvs_tpu_queue_destroy(self.q)
        self.q = None


def wrap(module, index, dim: int, params: BatchParams = BatchParams(),
         backend: str = "auto", **search_kw) -> BatchedSearcher:
    """Build a BatchedSearcher over any index module (the ``dynamic_batching::
    index`` analog: wraps an upstream index)."""

    def fn(queries):
        return module.search(index, queries, params.k, **search_kw)

    return BatchedSearcher(fn, dim, params, backend=backend)
