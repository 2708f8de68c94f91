"""Benchmark: best QPS at recall@10 >= 0.95 on SIFT-shape data (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors cuvs_bench (/root/reference/cpp/bench/ann/src/common/
benchmark.hpp:337-413): QPS = queries/sec over the search loop (compile
excluded), recall vs exact brute-force ground truth computed on-device
over the FULL query batch. Contenders (best recall-qualified QPS wins):
  * brute-force exact/approx at peak MXU FLOPs, unfused and fused-Pallas
  * int8 fused scan + exact refine
  * IVF-Flat through the fused Pallas cluster-major scan (+ refine)
  * CAGRA packed-layout graph search (+ refine to qualify at 0.95)
Dataset: $BENCH_DATASET from the cuvs_bench-parity registry
(cuvs_tpu/bench/datasets.py). Real .fbin files load from
$CUVS_TPU_DATASET_DIR; otherwise a seeded low-intrinsic-dim synthetic
stand-in with the same shape is used and labeled as such.
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
DATASET = os.environ.get("BENCH_DATASET", "sift-128-euclidean")
MAX_ROWS = int(os.environ.get("BENCH_N", 1_000_000))
NQ = int(os.environ.get("BENCH_NQ", 4096))
K = 10
CAGRA_BUDGET_S = float(os.environ.get("BENCH_CAGRA_BUDGET_S", 900))  # 0 = BF only


def _recall(found, gt):
    return float(
        np.mean([len(set(a.tolist()) & set(b.tolist())) / gt.shape[1] for a, b in zip(found, gt)])
    )


def _measure(results, label, fn, nq, gti, reps=5, min_time_s=1.5, max_reps=64):
    """Correctness pass + timed reps; appends (qps, recall, label).

    Reps auto-scale so the timed window is at least ``min_time_s`` —
    per-dispatch RPC overhead through the device relay is several ms,
    which at >100k QPS otherwise eats 20%+ of the measurement. Reps are
    dependency-chained (cuvs_tpu/bench/measure.py): the relay ELIDES
    repeated executions whose outputs are dropped — a drop-and-repeat
    loop reads physically impossible rates (2.4M "QPS" on a kernel whose
    VPU epilogue caps at ~650k).
    """
    import jax

    from cuvs_tpu.bench.measure import timed_qps

    d, i = fn()
    jax.block_until_ready(d)
    rec = _recall(np.asarray(i), gti)
    qps = timed_qps(fn, nq, reps=reps, min_time_s=min_time_s,
                    max_reps=max_reps)
    print(f"# {label}: recall@10={rec:.4f} qps={qps:.0f}", file=sys.stderr)
    results.append((qps, rec, label))
    return rec, qps


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # build/search timings depend on compile-cache state (r4's 22 s vs
    # 110 s IVF build mystery) — make it interpretable in the log
    n_cached = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    print(f"# compile cache: {n_cached} entries at {cache_dir}",
          file=sys.stderr)

    from cuvs_tpu.bench import datasets
    from cuvs_tpu.neighbors import brute_force

    ds = datasets.load(DATASET, max_rows=MAX_ROWS)
    n, dim = ds.base.shape
    nq = min(NQ, ds.queries.shape[0])
    x = jax.device_put(ds.base)
    q = jax.device_put(np.ascontiguousarray(ds.queries[:nq], np.float32)
                       if ds.queries.dtype != np.float32 else ds.queries[:nq])
    label_ds = f"{DATASET}{'(synthetic)' if ds.synthetic else ''}"
    print(f"# dataset {label_ds}: n={n} dim={dim} nq={nq}", file=sys.stderr)
    t_start = time.time()

    results = []  # (qps, recall, label)

    # never lose the result: a watchdog thread emits the best-so-far line
    # even if the main thread is wedged inside a device RPC (signal
    # handlers cannot run there), and SIGTERM does the same when it can
    def _bail(why):
        print(f"# emitting early ({why})", file=sys.stderr)
        _emit(results, n, dim, label_ds)
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, lambda s_, f_: _bail("sigterm"))
    watchdog = threading.Timer(DEADLINE_S, lambda: results and _bail("deadline"))
    watchdog.daemon = True
    watchdog.start()

    # ---- ground truth over the FULL query batch (exact, f32-HIGH) ----
    t0 = time.time()
    bf = brute_force.build(x, metric=ds.metric)
    if ds.gt_ids is not None and ds.gt_ids.shape[0] >= nq and not ds.synthetic:
        gti = ds.gt_ids[:nq, :K]
    else:
        gti = _ground_truth(bf, q, brute_force)
    print(f"# ground truth: {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- exact tier: unfused and fused-Pallas brute force ----
    for kw, label in (
        (dict(recall_target=None), "bf_exact_bf16"),
        (dict(recall_target=0.97), "bf_approx_bf16"),
    ):
        try:
            kw = dict(compute_dtype=jnp.bfloat16, query_chunk=1024, **kw)
            _measure(results, label,
                     lambda: brute_force.search(bf, q, K, **kw), nq, gti)
        except Exception as e:  # noqa: BLE001
            print(f"# {label} failed: {type(e).__name__}: {e}", file=sys.stderr)

    # fused Pallas kernel: quick tile-geometry autotune (the best config
    # varies a few % with relay/load), then the real measurement
    geo = {}
    try:
        geo = _autotune_fused(bf, q, nq, brute_force, jnp)
        _measure(
            results, "bf_fused_bf16",
            lambda: brute_force.search(
                bf, q, K, compute_dtype=jnp.bfloat16, recall_target=0.97,
                fused=True, **geo),
            nq, gti)
    except Exception as e:  # noqa: BLE001
        print(f"# bf_fused_bf16 failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ---- int8 fused scan + exact refine ----
    try:
        from cuvs_tpu.neighbors import refine as _refine

        bf8 = brute_force.build(x, metric=ds.metric, storage_dtype=jnp.int8)
        CAND = 40
        # int8 scoring runs the MXU above the bf16 rate (measured ~1.5x at
        # 1M x 128), so this tier leads the headline when the quantized
        # ranking alone clears the recall floor — tune its geometry
        # separately (int8 rows are 2x smaller, so larger tiles fit VMEM;
        # the bf16 winner is seeded as the first candidate/fallback)
        geo8 = _autotune_fused(bf8, q, nq, brute_force, jnp, seed_geo=geo)
        kw8 = dict(query_chunk=1024, recall_target=0.97, fused=True, **geo8)

        _measure(results, "bf_int8_fused",
                 lambda: brute_force.search(bf8, q, K, **kw8), nq, gti)

        def int8_search():
            _, cand = brute_force.search(bf8, q, CAND, **kw8)
            return _refine.refine(bf.dataset, q, cand, K, metric=ds.metric)

        _measure(results, "bf_int8_fused_refine", int8_search, nq, gti)
        del bf8
    except Exception as e:  # noqa: BLE001
        print(f"# int8 phase failed: {type(e).__name__}: {e}", file=sys.stderr)

    # ---- IVF-Flat via the fused Pallas cluster-major scan ----
    try:
        _ivf_phase(results, x, q, gti, bf, ds.metric, nq, n)
    except Exception as e:  # noqa: BLE001
        print(f"# ivf phase failed: {type(e).__name__}: {e}", file=sys.stderr)

    # ---- CAGRA (best-effort; never loses the earlier results) ----
    try:
        _cagra_phase(results, x, q, gti, t_start, ds.metric, nq, bf)
    except Exception as e:  # noqa: BLE001
        print(f"# cagra phase failed: {type(e).__name__}: {e}", file=sys.stderr)
    _emit(results, n, dim, label_ds)


def _ground_truth(bf, q, brute_force):
    """Exact f32 ground truth (fused exact kernel + unfused cross-check,
    shared with the measurement scripts — cuvs_tpu/bench/gt.py)."""
    from cuvs_tpu.bench.gt import exact_ground_truth

    return exact_ground_truth(bf, q, K)


def _autotune_fused(bf, q, nq, brute_force, jnp, seed_geo=None):
    """Pick the fused-BF tile geometry: amortized timed reps per candidate.

    Measured best at 1M x 128 bf16 on v5e is (tile 32768, block 512) =
    359k QPS (docs/benchmarks.md BF ladder), but the optimum shifts with
    dataset shape and relay conditions — tune, don't assume. The sweep
    covers the chunked-matmul geometries (mxu_n < tile_n bounds the live
    dots slab so block_q=1024 fits VMEM — fewer grid steps, no 64M
    dots round-trip)."""
    import jax

    candidates = [
        dict(fused_tile_n=32768, fused_block_q=512),
        dict(fused_tile_n=16384, fused_block_q=512),
        dict(fused_tile_n=32768, fused_block_q=512, fused_mxu_n=4096),
        dict(fused_tile_n=32768, fused_block_q=1024, fused_mxu_n=4096),
        dict(fused_tile_n=32768, fused_block_q=1024, fused_mxu_n=8192),
    ]
    if seed_geo:
        # tuning a second tier (int8): start from the bf16 winner and
        # probe the rest of the valid space (the kernel clamps
        # tile_n > 32768 and block_q > 512-with-mxu_n > 8192, so bigger
        # nominal tiles would silently measure a different geometry)
        candidates = [seed_geo] + [
            g for g in (
                dict(fused_tile_n=32768, fused_block_q=1024, fused_mxu_n=8192),
                dict(fused_tile_n=32768, fused_block_q=1024, fused_mxu_n=4096),
                dict(fused_tile_n=16384, fused_block_q=1024, fused_mxu_n=8192),
            ) if g != seed_geo
        ]
    best, best_qps = candidates[0], 0.0
    for geo in candidates:
        def fn():
            return brute_force.search(
                bf, q, K, compute_dtype=jnp.bfloat16, recall_target=0.97,
                fused=True, **geo)
        try:
            from cuvs_tpu.bench.measure import timed_qps

            out = fn()
            jax.block_until_ready(out[0])  # compile + warm
            # amortized reps, same discipline as _measure: 1-shot samples
            # are dispatch-dominated (~2x below the measured number) and
            # pick from noise — time a >=0.3 s window instead, chained
            # so the relay cannot elide repeats (measure.py)
            qps = timed_qps(fn, nq, reps=3, min_time_s=0.3, max_reps=32)
            print(f"# autotune fused {geo}: {qps:.0f}", file=sys.stderr)
            if qps > best_qps:
                best, best_qps = geo, qps
        except Exception as e:  # noqa: BLE001
            print(f"# autotune {geo} failed: {e}", file=sys.stderr)
    return best


def _ivf_phase(results, x, q, gti, bf, metric, nq, n):
    import jax
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import ivf_flat, refine as _refine

    if metric not in ("sqeuclidean", "euclidean", "inner_product"):
        print(f"# skipping ivf (metric {metric})", file=sys.stderr)
        return
    n_lists = max(256, min(4096, int((n / 1000) ** 0.5) * 64))
    t0 = time.time()
    idx = ivf_flat.build(x, n_lists=n_lists, metric=metric, seed=0,
                         storage_dtype=jnp.bfloat16)
    jax.block_until_ready(idx.sorted_data)
    print(f"# ivf_flat build ({n_lists} lists): {time.time()-t0:.1f}s",
          file=sys.stderr)

    best_rec, last_p = 0.0, 64
    for p in (32, 64, 128, 256):
        sp = ivf_flat.SearchParams(n_probes=p, scan_algo="fused",
                                   compute_dtype=jnp.bfloat16,
                                   recall_target=0.97)
        rec, qps = _measure(
            results, f"ivf_fused_p{p}",
            lambda: ivf_flat.search(idx, q, K, sp), nq, gti)
        best_rec, last_p = max(best_rec, rec), p
        if rec >= 0.96:
            break
    if best_rec < 0.96:
        # refine pass: candidates from the fused scan, exact re-rank
        CAND = 40
        sp = ivf_flat.SearchParams(n_probes=last_p, scan_algo="fused",
                                   compute_dtype=jnp.bfloat16,
                                   recall_target=0.97)

        def ivf_refined():
            _, cand = ivf_flat.search(idx, q, CAND, sp)
            return _refine.refine(bf.dataset, q, cand, K, metric=metric)

        _measure(results, f"ivf_fused_p{last_p}_refine", ivf_refined, nq, gti)


def _cagra_phase(results, x, q, gti, t_start, metric, nq, bf):
    import jax
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import cagra, refine as _refine

    if time.time() - t_start > CAGRA_BUDGET_S:
        print("# skipping cagra (budget)", file=sys.stderr)
        return

    # build ladder: reference defaults (cagra.hpp:151-153) first; on a
    # device fault retry the r3-proven 64->32 config so the bench NEVER
    # ships a crashed phase (the r4 failure mode, VERDICT r4 #1)
    index = None
    for igd, gd in ((128, 64), (64, 32)):
        t0 = time.time()
        try:
            index = cagra.build(
                x,
                intermediate_graph_degree=igd,
                graph_degree=gd,
                build_algo="auto",  # partitioned exact above 150k rows
                metric=metric,
                build_compute_dtype=jnp.bfloat16,
                build_recall_target=0.97,
                seed=0,
            )
            jax.block_until_ready(index.graph)
            print(f"# cagra build ({igd}->{gd}): {time.time()-t0:.1f}s",
                  file=sys.stderr)
            break
        except Exception as e:  # noqa: BLE001
            print(f"# cagra build ({igd}->{gd}) failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            index = None
    if index is None:
        return
    # layout ladder: STANDARD first so its rows are recorded before the
    # HBM-peak pack() attempt — an OOMing pack leaves the device runtime
    # resource-exhausted for the rest of the process (r5 ladder evidence),
    # so it must never run before the fallback rows exist. Packed (2.4x
    # measured over std at deg32) is attempted after, gated to shapes
    # whose child array leaves headroom next to the bench's residents.
    layouts = [(index, "std")]

    for li, (serve, tag) in enumerate(layouts):
        best_rec, faulted = 0.0, False
        for itopk, width in ((64, 2), (128, 2)):
            if time.time() - t_start > CAGRA_BUDGET_S + 300:
                break
            kw = dict(itopk_size=itopk, search_width=width, query_chunk=nq,
                      compute_dtype=jnp.bfloat16)
            try:
                rec, _ = _measure(
                    results, f"cagra_{tag}_itopk{itopk}",
                    lambda: cagra.search(serve, q, K, **kw), nq, gti, reps=3)
            except Exception as e:  # noqa: BLE001
                print(f"# cagra_{tag}_itopk{itopk} failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                faulted = True
                break  # try the next layout
            best_rec = max(best_rec, rec)
            if rec >= 0.95:
                break
        if faulted:
            continue
        if best_rec < 0.95:
            # qualify via exact refine over a wider candidate set
            CAND = 40
            kw = dict(itopk_size=max(64, CAND), search_width=2,
                      query_chunk=nq, compute_dtype=jnp.bfloat16)

            def cagra_refined():
                _, cand = cagra.search(serve, q, CAND, **kw)
                return _refine.refine(bf.dataset, q, cand, K, metric=metric)

            try:
                _measure(results, f"cagra_{tag}_refine", cagra_refined,
                         nq, gti, reps=3)
            except Exception as e:  # noqa: BLE001
                print(f"# cagra_{tag}_refine failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                continue
        # std rows are recorded — NOW try the packed upgrade (2.4x measured
        # over std at deg32). Gated to child arrays that leave headroom
        # beside the bench residents: an OOMing pack leaves the device
        # runtime resource-exhausted for the rest of the process
        # (r5 ladder evidence), so it must never run before fallback rows.
        n_, gd_ = serve.graph.shape if tag == "std" else (0, 0)
        if (li == len(layouts) - 1 and tag == "std"
                and n_ * gd_ * index.dim <= 5 << 30
                and time.time() - t_start <= CAGRA_BUDGET_S + 300):
            try:
                packed = cagra.pack(index)
                jax.block_until_ready(packed.child_vecs)
                layouts.append((packed, "packed"))
            except Exception as e:  # noqa: BLE001
                print(f"# cagra pack unavailable ({type(e).__name__}: {e})",
                      file=sys.stderr)


def _emit(results, n, dim, label_ds):
    qualified = [r for r in results if r[1] >= 0.95]
    best = max(qualified or results, key=lambda r: r[0])
    qps, rec, label = best
    print(
        json.dumps(
            {
                "metric": f"qps@recall10>=0.95 ({label_ds} n={n}, d={dim}, {label}, recall={rec:.3f})",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / H100_BASELINE_QPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
