"""CAGRA at 1M x 128, reference-default degrees (128 -> 64), packed
layout, itopk ladder + bitset-prefiltered row (BASELINE config 4 shape).

Records the visited-ring + reference-degree recall ladder. GIST-1M-shape
run: set DIM=960 N_ROWS=1000000.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np

N = int(os.environ.get("N_ROWS", 1_000_000))
D = int(os.environ.get("DIM", 128))
NQ = int(os.environ.get("NQ", 4096))
K = 10
IGD = int(os.environ.get("IGD", 128))
GD = int(os.environ.get("GD", 64))
FILTER_KEEP = float(os.environ.get("FILTER_KEEP", 0.9))
# "auto" partitioned-exact suits <=256-dim; at GIST dims the reference-
# typical IVF-PQ graph build keeps peak HBM bounded (cagra.hpp build_algo)
BUILD_ALGO = os.environ.get("BUILD_ALGO", "auto")


def main():
    import jax
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import brute_force, cagra, filters, refine

    print(f"# {jax.devices()} n={N} d={D} igd={IGD}->{GD}", file=sys.stderr,
          flush=True)
    key = jax.random.PRNGKey(0)
    k1, k4 = jax.random.split(key, 2)
    r = D // 4
    proj = jax.random.normal(k1, (r, D), jnp.float32) / np.sqrt(r)

    # generate in slices and keep the dataset HOST-side: at GIST dims
    # (960) a resident f32 copy is 3.8 GB — build/search phases upload
    # what they need, so the peak-HBM phase (the graph build) gets the
    # whole chip
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(key, rows):
        kz, kn = jax.random.split(key)
        return (jax.random.normal(kz, (rows, r), jnp.float32) @ proj
                + 0.05 * jax.random.normal(kn, (rows, D), jnp.float32))

    SL = 250_000
    x = np.empty((N, D), np.float32)
    for i in range(0, N, SL):
        rows = min(SL, N - i)
        x[i : i + rows] = np.asarray(gen(jax.random.PRNGKey(100 + i), rows))
        print(f"# datagen {i+rows}", file=sys.stderr, flush=True)
    q = np.asarray(gen(k4, NQ))
    print("# queries ready", file=sys.stderr, flush=True)

    from cuvs_tpu.bench.gt import exact_ground_truth

    x16 = jnp.asarray(x, jnp.bfloat16)  # refine source (1/2 HBM)
    # EXACT f32 ground truth + unfused cross-check (a >=0.95 recall floor
    # asserted against approximate GT would be soft) — bf index built over
    # the f32 host copy; freed before the graph build
    bf = brute_force.build(jnp.asarray(x))
    gti = exact_ground_truth(bf, q, K)
    print("# exact ground truth ready", file=sys.stderr, flush=True)
    del bf  # free the GT index's device copies before the graph build

    t0 = time.time()
    index = cagra.build(
        x16, intermediate_graph_degree=IGD, graph_degree=GD,
        build_algo=BUILD_ALGO, build_compute_dtype=jnp.bfloat16,
        build_recall_target=0.97, seed=0,
    )
    jax.block_until_ready(index.graph)
    print(f"build: {time.time()-t0:.0f}s", flush=True)

    def recall(i, gt=gti):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / gt.shape[1]
            for a, b in zip(np.asarray(i), gt)
        ]))

    import json

    rows = []
    out_path = os.environ.get("OUT_JSON", "")

    def flush_rows():
        # incremental: a crash in a later phase (e.g. pack OOM) must not
        # lose the recall-floor rows already measured
        if out_path:
            with open(out_path, "w") as f:
                json.dump({"n": N, "dim": D, "nq": NQ, "igd": IGD, "gd": GD,
                           "build_algo": BUILD_ALGO, "rows": rows}, f,
                          indent=1)

    from cuvs_tpu.bench.measure import timed_qps

    def bench(label, fn, rec_fn=recall):
        _, di = fn()
        rec = rec_fn(np.asarray(di))
        # dependency-chained reps: the relay elides repeated executions
        # whose outputs are dropped (cuvs_tpu/bench/measure.py)
        qps = timed_qps(fn, NQ, reps=5)
        print(f"{label}: recall@10={rec:.4f} qps={qps:.0f}", flush=True)
        rows.append({"config": label, "recall@10": round(rec, 4),
                     "qps": round(qps, 1)})
        flush_rows()
        return rec

    # standard layout FIRST: the recall-floor / filtered / ring rows must
    # land before the HBM-peak pack() attempt (r5: a failed pack left the
    # runtime resource-exhausted and took the whole ladder down with it)
    layouts = [(index, "std")] if os.environ.get("STD", "1") == "1" else []
    for idx, tag in layouts:
        for itopk, w in ((64, 2), (128, 2), (192, 2), (256, 2)):
            kw = dict(itopk_size=itopk, search_width=w, query_chunk=NQ,
                      compute_dtype=jnp.bfloat16)
            rec = bench(f"cagra_{tag}_itopk{itopk}_w{w}",
                        lambda: cagra.search(idx, q, K, **kw))
            if rec >= 0.97:
                break
        # refine row: wide candidates + exact bf16 re-rank (first layout)
        if (idx, tag) == layouts[0]:
            kw = dict(itopk_size=128, search_width=2, query_chunk=NQ,
                      compute_dtype=jnp.bfloat16)
            serve = idx

            def refined():
                _, cand = cagra.search(serve, q, 40, **kw)
                return refine.refine(x16, q, cand, K,
                                     compute_dtype=jnp.bfloat16)

            bench(f"cagra_{tag}_itopk128_refine", refined)

    # bitset-prefiltered row (BASELINE config 4: prefiltered queries)
    keep = np.random.default_rng(0).random(N) < FILTER_KEEP
    flt = filters.from_mask(jnp.asarray(keep))
    # filtered ground truth: exact over kept rows only
    kept_ids = np.nonzero(keep)[0]
    bfk = brute_force.build(jnp.asarray(x[kept_ids]))
    gtik = kept_ids[exact_ground_truth(bfk, q, K)]
    xk = None
    del bfk, xk  # free before the filtered searches
    print("# filtered ground truth ready", file=sys.stderr, flush=True)

    if layouts:
        serve, stag = layouts[0]
        kw = dict(itopk_size=128, search_width=2, query_chunk=NQ,
                  compute_dtype=jnp.bfloat16)
        bench(f"cagra_{stag}_itopk128_filtered{FILTER_KEEP}",
              lambda: cagra.search(serve, q, K, prefilter=flt, **kw),
              rec_fn=lambda i: recall(i, gtik))

        # filtered + exact re-rank: candidates are filter-valid by
        # construction, so refine preserves the filter while lifting the
        # bf16-ranking row over the 0.95 floor (common.hpp:500-660 +
        # refine.hpp semantics composed)
        def filtered_refined():
            _, cand = cagra.search(serve, q, 40, prefilter=flt, **kw)
            return refine.refine(x16, q, cand, K,
                                 compute_dtype=jnp.bfloat16)

        bench(f"cagra_{stag}_itopk128_filtered{FILTER_KEEP}_refine",
              filtered_refined, rec_fn=lambda i: recall(i, gtik))

    # visited-ring trade-off, measured ON-CHIP (hashmap.hpp HASH vs SMALL
    # analog): ring on (auto) vs off (visited_size=-1) at itopk 64/128
    if layouts and os.environ.get("RING_SWEEP", "1") == "1":
        for itopk in (64, 128):
            for vs, vtag in ((0, "ring"), (-1, "noring")):
                kw = dict(itopk_size=itopk, search_width=2, query_chunk=NQ,
                          compute_dtype=jnp.bfloat16, visited_size=vs)
                bench(f"cagra_{stag}_itopk{itopk}_{vtag}",
                      lambda: cagra.search(serve, q, K, **kw))

    # packed layout LAST (trades HBM for gather locality: child_vecs is
    # N*GD*D int8 — 8 GiB at 1M x 128 x deg64, a <=256-dim play). Runs
    # after every std row is recorded because a pack OOM can leave the
    # device runtime unusable for the rest of the process.
    if N * GD * D <= 9 << 30 and os.environ.get("PACK", "1") == "1":
        t0 = time.time()
        try:
            packed = cagra.pack(index)
            jax.block_until_ready(packed.child_vecs)
            print(f"pack: {time.time()-t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001 - std rows already recorded
            packed = None
            print(f"# pack failed ({type(e).__name__}: {e}); std rows stand",
                  file=sys.stderr, flush=True)
        if packed is not None:
            for itopk, w in ((64, 2), (128, 2), (192, 2), (256, 2)):
                kw = dict(itopk_size=itopk, search_width=w, query_chunk=NQ,
                          compute_dtype=jnp.bfloat16)
                rec = bench(f"cagra_packed_itopk{itopk}_w{w}",
                            lambda: cagra.search(packed, q, K, **kw))
                if rec >= 0.97:
                    break
            # packed + exact bf16 re-rank: the high-QPS row qualified to
            # the recall floor (int8 children rank, exact distances decide)
            kwp = dict(itopk_size=128, search_width=2, query_chunk=NQ,
                       compute_dtype=jnp.bfloat16)

            def packed_refined():
                _, cand = cagra.search(packed, q, 40, **kwp)
                return refine.refine(x16, q, cand, K,
                                     compute_dtype=jnp.bfloat16)

            bench("cagra_packed_itopk128_refine", packed_refined)
            bench(f"cagra_packed_itopk128_filtered{FILTER_KEEP}",
                  lambda: cagra.search(packed, q, K, prefilter=flt, **kwp),
                  rec_fn=lambda i: recall(i, gtik))

            def packed_filtered_refined():
                _, cand = cagra.search(packed, q, 40, prefilter=flt, **kwp)
                return refine.refine(x16, q, cand, K,
                                     compute_dtype=jnp.bfloat16)

            bench(f"cagra_packed_itopk128_filtered{FILTER_KEEP}_refine",
                  packed_filtered_refined, rec_fn=lambda i: recall(i, gtik))

    flush_rows()
    if out_path:
        print(f"# wrote {out_path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
