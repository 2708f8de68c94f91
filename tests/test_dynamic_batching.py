import threading
import time

import numpy as np
import pytest

from cuvs_tpu.neighbors import brute_force, dynamic_batching
from tests.utils import naive_knn, calc_recall, make_blobs

RNG = np.random.default_rng(71)

# exercise BOTH queue implementations: the Python condvar collector and
# the compiled MPSC ring (native/batch_queue.cpp, skipped when not built)
BACKENDS = ["python"]
if dynamic_batching._native_queue_lib() is not None:
    BACKENDS.append("native")


@pytest.mark.parametrize("backend", BACKENDS)
def test_batched_matches_direct(backend):
    x = make_blobs(RNG, 2000, 16)
    idx = brute_force.build(x)
    bs = dynamic_batching.wrap(
        brute_force, idx, dim=16, backend=backend,
        params=dynamic_batching.BatchParams(k=5, max_batch_size=32, dispatch_timeout_ms=5),
    )
    q = make_blobs(RNG, 10, 16)
    d, i = bs.search(q)
    dd, ii = brute_force.search(idx, q, 5)
    np.testing.assert_array_equal(i, np.asarray(ii))
    bs.close()


@pytest.mark.parametrize("backend", BACKENDS)
def test_concurrent_requests_aggregate(backend):
    x = make_blobs(RNG, 3000, 8)
    idx = brute_force.build(x)
    bs = dynamic_batching.wrap(
        brute_force, idx, dim=8, backend=backend,
        params=dynamic_batching.BatchParams(k=3, max_batch_size=64, dispatch_timeout_ms=20),
    )
    gtd_all, gti_all = naive_knn(x[:64], x, 3)
    futs = [bs.submit(x[j][None]) for j in range(64)]
    results = [f.result(timeout=30) for f in futs]
    ids = np.concatenate([r[1] for r in results], axis=0)
    assert calc_recall(ids, gti_all) >= 0.999
    bs.close()


@pytest.mark.parametrize("backend", BACKENDS)
def test_multi_row_requests_across_batches(backend):
    """Requests larger than max_batch_size span several dispatches and
    still resolve with all rows in order."""
    x = make_blobs(RNG, 2000, 8)
    idx = brute_force.build(x)
    bs = dynamic_batching.wrap(
        brute_force, idx, dim=8, backend=backend,
        params=dynamic_batching.BatchParams(k=3, max_batch_size=16, dispatch_timeout_ms=5),
    )
    q = x[:40]
    d, i = bs.search(q, timeout=60)
    dd, ii = brute_force.search(idx, q, 3)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ii))
    bs.close()


@pytest.mark.parametrize("backend", BACKENDS)
def test_error_propagates(backend):
    def broken(q):
        raise RuntimeError("boom")

    bs = dynamic_batching.BatchedSearcher(
        broken, dim=4, backend=backend,
        params=dynamic_batching.BatchParams(k=1, max_batch_size=4, dispatch_timeout_ms=1),
    )
    fut = bs.submit(np.zeros((1, 4), np.float32))
    try:
        fut.result(timeout=10)
        assert False, "expected exception"
    except RuntimeError as e:
        assert "boom" in str(e)
    bs.close()


def test_dim_mismatch_rejected():
    x = make_blobs(RNG, 100, 8)
    idx = brute_force.build(x)
    bs = dynamic_batching.wrap(brute_force, idx, dim=8)
    try:
        bs.submit(np.zeros((1, 5), np.float32))
        assert False
    except ValueError:
        pass
    bs.close()


def test_auto_tune_adapts_timeout():
    """auto_tune pulls the dispatch timeout toward a fraction of the
    measured service time and exposes rolling latency percentiles."""
    from cuvs_tpu.neighbors.dynamic_batching import BatchedSearcher, BatchParams

    def slow_search(q):
        time.sleep(0.02)  # 20 ms service time
        return np.zeros((q.shape[0], 5), np.float32), np.zeros(
            (q.shape[0], 5), np.int32)

    p = BatchParams(k=5, max_batch_size=16, dispatch_timeout_ms=50.0,
                    auto_tune=True, auto_tune_fraction=0.5)
    s = BatchedSearcher(slow_search, dim=8, params=p, backend="python")
    try:
        for _ in range(6):
            s.search(np.zeros((2, 8), np.float32))
        st = s.stats()
        assert st["n_requests"] >= 6
        assert st["latency_p95_ms"] is not None
        # 50 ms configured timeout must have adapted toward 0.5 * ~20 ms
        assert st["dispatch_timeout_ms"] < 25.0, st
    finally:
        s.close()
