"""Tracing/profiling annotations.

Reference: NVTX ranges wrapping every public entry
(/root/reference/cpp/src/core/nvtx.hpp:10-54, compile-gated by CUVS_NVTX).
TPU analog: ``jax.named_scope`` ranges (visible in XLA/Perfetto traces via
``jax.profiler``) plus an optional wall-clock logger enabled by
``CUVS_TPU_TRACE=1``.
"""

from __future__ import annotations

import functools
import logging
import os
import time

import jax

logger = logging.getLogger("cuvs_tpu")


def traced(name: str):
    """Decorator: jax.named_scope + optional timing log (nvtx::range analog)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kw):
            with jax.named_scope(name):
                if os.environ.get("CUVS_TPU_TRACE"):
                    t0 = time.perf_counter()
                    out = fn(*args, **kw)
                    logger.info("%s: %.3f ms", name, (time.perf_counter() - t0) * 1e3)
                    return out
                return fn(*args, **kw)

        return wrapper

    return deco


def start_profiler_trace(log_dir: str):
    """Begin a device trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    jax.profiler.stop_trace()
