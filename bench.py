"""Benchmark: best QPS at recall@10 >= 0.95 on SIFT-shaped data (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors cuvs_bench (/root/reference/cpp/bench/ann/src/common/
benchmark.hpp:337-413): QPS = queries/sec over the search loop (compile
excluded), recall vs exact brute-force ground truth computed on-device.
Two contenders are measured and the best recall-qualified QPS wins:
  * brute-force exact/approx at peak MXU FLOPs (TPU-KNN design)
  * CAGRA graph search
``vs_baseline`` is measured QPS divided by an assumed cuVS-on-H100
SIFT-class figure (~600k QPS @ recall 0.95; the reference repo publishes
no absolute numbers — BASELINE.json "published": {}).
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

H100_BASELINE_QPS = 600_000.0

DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 1500))
N = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
NQ = int(os.environ.get("BENCH_NQ", 4096))
K = 10
GT_N = 1024
CAGRA_BUDGET_S = float(os.environ.get("BENCH_CAGRA_BUDGET_S", 0))  # 0 = BF only (the 1M nn_descent program stresses the remote compile host; opt in with the env var)


def _recall(found, gt):
    return float(
        np.mean([len(set(a.tolist()) & set(b.tolist())) / gt.shape[1] for a, b in zip(found, gt)])
    )


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from cuvs_tpu.neighbors import brute_force, cagra

    # low-intrinsic-dimension synthetic (embedding-like; iid gaussian is
    # the degenerate ANN case and wildly unrepresentative)
    rng = np.random.default_rng(0)
    r = max(16, DIM // 4)
    proj = (rng.standard_normal((r, DIM)) / np.sqrt(r)).astype(np.float32)
    xh = rng.standard_normal((N, r), dtype=np.float32) @ proj
    xh += 0.05 * rng.standard_normal((N, DIM), dtype=np.float32)
    qh = rng.standard_normal((NQ, r), dtype=np.float32) @ proj
    qh += 0.05 * rng.standard_normal((NQ, DIM), dtype=np.float32)
    x = jax.device_put(xh)
    q = jax.device_put(qh)
    del xh, qh
    t_start = time.time()

    def sync(t):
        jax.block_until_ready(t)
        return t

    results = []  # (qps, recall, label)

    # never lose the result: a watchdog thread emits the best-so-far line
    # even if the main thread is wedged inside a device RPC (signal
    # handlers cannot run there), and SIGTERM does the same when it can
    def _bail(why):
        print(f"# emitting early ({why})", file=sys.stderr)
        _emit(results)
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, lambda s_, f_: _bail("sigterm"))
    watchdog = threading.Timer(DEADLINE_S, lambda: results and _bail("deadline"))
    watchdog.daemon = True
    watchdog.start()

    # ---- ground truth (exact, f32-HIGH) ----
    t0 = time.time()
    bf = brute_force.build(x)
    gtd, gti = brute_force.search(bf, q[:GT_N], K)
    gti = np.asarray(gti)
    print(f"# ground truth: {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- contender 1: brute force bf16 + approx select ----
    for rt, label in ((None, "bf_exact_bf16"), (0.97, "bf_approx_bf16")):
        kw = dict(compute_dtype=jnp.bfloat16, recall_target=rt, query_chunk=1024)
        d, i = sync(brute_force.search(bf, q, K, **kw))
        rec = _recall(np.asarray(i)[:GT_N], gti)
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = brute_force.search(bf, q, K, **kw)
        sync(out[0])
        qps = NQ * reps / (time.time() - t0)
        print(f"# {label}: recall@10={rec:.4f} qps={qps:.0f}", file=sys.stderr)
        results.append((qps, rec, label))

    # ---- contender 2: CAGRA (best-effort; never loses the BF result) ----
    try:
        _cagra_phase(results, x, q, gti, t_start)
    except Exception as e:  # noqa: BLE001
        print(f"# cagra phase failed: {type(e).__name__}: {e}", file=sys.stderr)
    _emit(results)


def _cagra_phase(results, x, q, gti, t_start):
    import jax
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import cagra

    def sync(t):
        jax.block_until_ready(t)
        return t

    if time.time() - t_start > CAGRA_BUDGET_S:
        print("# skipping cagra (budget)", file=sys.stderr)
        return
    from cuvs_tpu.neighbors import nn_descent

    t0 = time.time()
    index = cagra.build(
        x,
        intermediate_graph_degree=64,
        graph_degree=32,
        build_algo="auto",
        build_compute_dtype=jnp.bfloat16,
        build_recall_target=0.97,
        nn_descent_params=nn_descent.IndexParams(
            graph_degree=64, intermediate_graph_degree=64,
            max_iterations=10, sample_per_node=512, seed=0,
        ),
        seed=0,
    )
    jax.block_until_ready(index.graph)
    print(f"# cagra build: {time.time()-t0:.1f}s n={N} dim={DIM}", file=sys.stderr)

    for itopk in (64, 128):
        kw = dict(itopk_size=itopk, search_width=2, query_chunk=NQ, compute_dtype=jnp.bfloat16)
        d, i = sync(cagra.search(index, q, K, **kw))
        rec = _recall(np.asarray(i)[:GT_N], gti)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = cagra.search(index, q, K, **kw)
        sync(out[0])
        qps = NQ * reps / (time.time() - t0)
        print(f"# cagra itopk={itopk}: recall@10={rec:.4f} qps={qps:.0f}", file=sys.stderr)
        results.append((qps, rec, f"cagra_itopk{itopk}"))


def _emit(results):
    qualified = [r for r in results if r[1] >= 0.95]
    best = max(qualified or results, key=lambda r: r[0])
    qps, rec, label = best
    print(
        json.dumps(
            {
                "metric": f"qps@recall10>=0.95 (n={N}, d={DIM}, {label}, recall={rec:.3f})",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / H100_BASELINE_QPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
