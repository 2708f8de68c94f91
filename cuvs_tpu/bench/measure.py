"""Elision-proof QPS measurement for relay-attached TPUs.

The device relay ELIDES repeated executions whose outputs are dropped:
a plain ``for _ in range(reps): out = fn()`` loop followed by one
``block_until_ready(out)`` can read several times above the hardware's
physical ceiling (measured on v5e: 2.4M "QPS" for a fused kernel whose
VPU epilogue alone caps at ~650k), because only the last rep's result
is live — the relay is free to skip, memoize, or early-ack the rest.

The fix is a data dependency THROUGH every rep: fold each rep's output
into a scalar accumulator and fetch the accumulator once at the end.
The folds are tiny jitted adds, so the loop still pipelines — measured
chained-vs-unchained rates agree wherever the unchained loop happens to
be honest, and the chained rate is physically consistent everywhere.

Methodology otherwise mirrors the reference bench harness
(/root/reference/cpp/bench/ann/src/common/benchmark.hpp:337-413):
QPS over the search loop, compile excluded, recall computed separately.
"""

from __future__ import annotations

import time

_FOLD = None


def _fold():
    global _FOLD
    if _FOLD is None:
        import jax

        @jax.jit
        def fold(acc, d):
            return acc + d.astype("float32").sum()

        _FOLD = fold
    return _FOLD


def timed_qps(fn, nq, reps=5, min_time_s=0.0, max_reps=64):
    """Time ``fn`` (returning (dists, ids) device arrays) for ``reps``
    dependency-chained repetitions; returns measured QPS.

    ``fn`` must already be warm (compiled). With ``min_time_s`` set,
    reps auto-scale so the timed window is at least that long —
    per-dispatch RPC overhead through the relay is several ms, which at
    high QPS otherwise dominates the measurement.
    """
    import jax.numpy as jnp

    fold = _fold()
    # warm the fold OUTSIDE the clock: its first call compiles, and a
    # relay compile can dwarf the whole timed window
    out = fn()
    float(fold(jnp.float32(0), out[0]))
    if min_time_s > 0:
        t0 = time.time()
        out = fn()
        acc = fold(jnp.float32(0), out[0])
        float(acc)
        per_rep = max(time.time() - t0, 1e-4)
        reps = int(max(reps, min(max_reps, -(-min_time_s // per_rep))))
    acc = jnp.float32(0)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        acc = fold(acc, out[0])
    float(acc)  # host fetch forces the whole chain
    return nq * reps / (time.time() - t0)
