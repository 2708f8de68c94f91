"""Full-shape multi-chip rehearsal on the 8-device CPU mesh.

Backs the docs/scale.md v5p-8 composition claim ("12.5M bf16/int8 rows
per chip") with an EXECUTED program instead of an extrapolation: the
complete 100M x 96 dataset is built into a sharded mg IVF-Flat index
(12.5M rows / 1.2 GB int8 per device — the exact leaf shapes a v5p-8
run would carry), searched through the real shard_map + all_gather
merge path, and scored against streamed exact ground truth.
Reference analog: snmg.cuh:561-650 (sharded search + merge).

What is full-shape vs scaled here:
  - array SHAPES (rows/shard, dims, index leaves, merge widths): full;
  - COMPUTE knobs (n_lists/shard, kmeans iters, nq): reduced for the
    single host core that backs all 8 virtual devices — recall floors
    here validate merge correctness, not a tuned operating point.

Phase 2 (optional, CAGRA=1): a sharded CAGRA build+search at 1M x 96
(125k rows/shard) — the graph family through the same mg path.

Usage: python scripts/run_mg_rehearsal.py   (~15-25 min on one core)
Emits one JSON line per phase for docs/benchmarks.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

N = int(os.environ.get("N_ROWS", 100_000_000))
D = 96
NQ = int(os.environ.get("NQ", 16))
K = 10
SLICE = int(os.environ.get("SLICE", 2_500_000))  # 40 slices -> 5/shard
N_LISTS = int(os.environ.get("N_LISTS", 512))    # per shard
CACHE = os.environ.get("DATASET_CACHE", "/root/x100m_f32.npy")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cuvs_tpu import mg

    assert jax.device_count() == 8, jax.devices()
    print(f"# mesh devices: {jax.device_count()}", file=sys.stderr, flush=True)

    if not os.path.exists(CACHE):
        raise SystemExit(
            f"stage the dataset first: GEN_ONLY=1 python scripts/run_100m.py"
            f" (missing {CACHE})")
    x = np.lib.format.open_memmap(CACHE, mode="r")
    assert x.shape[0] >= N and x.shape[1] == D, x.shape
    x = x[:N]  # N_ROWS < cache rows = reduced smoke run

    rng = np.random.Generator(np.random.SFC64(123))
    # queries near dataset rows so recall@10 is a meaningful signal
    qi = rng.integers(0, N, NQ)
    q = x[np.sort(qi)].astype(np.float32) + 0.01 * rng.standard_normal(
        (NQ, D)).astype(np.float32)

    # ---- streamed exact ground truth (host, f32) ----
    t0 = time.time()
    best_d = np.full((NQ, K), np.inf, np.float32)
    best_i = np.zeros((NQ, K), np.int64)
    qn = (q * q).sum(1)[:, None]
    for s in range(0, N, SLICE):
        e = min(s + SLICE, N)
        blk = np.asarray(x[s:e])
        d = qn + (blk * blk).sum(1)[None, :] - 2.0 * (q @ blk.T)
        top = np.argpartition(d, K, axis=1)[:, :K]
        cd = np.take_along_axis(d, top, axis=1)
        alld = np.concatenate([best_d, cd], axis=1)
        alli = np.concatenate([best_i, top + s], axis=1)
        sel = np.argsort(alld, axis=1)[:, :K]
        best_d = np.take_along_axis(alld, sel, axis=1)
        best_i = np.take_along_axis(alli, sel, axis=1)
    gti = best_i
    print(f"# ground truth: {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    from cuvs_tpu.neighbors import refine as _refine

    def recall(i):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(np.asarray(i), gti)
        ]))

    CAND = int(os.environ.get("CAND", 40))
    n_slices = -(-N // SLICE)

    if os.environ.get("FLAT", "1") == "1":
        # ---- full-shape sharded streaming build ----
        t0 = time.time()
        idx = mg.build_streaming(
            lambda i: x[i * SLICE : (i + 1) * SLICE],
            n_slices,
            n_lists=N_LISTS,
            trainset_rows=250_000,
            kmeans_n_iters=4,
            seed=0,
        )
        jax.block_until_ready(idx.shards.sorted_data)
        build_s = time.time() - t0
        per_shard = idx.shards.sorted_data.shape
        print(f"# build_streaming: {build_s:.0f}s shard leaves {per_shard} "
              f"{idx.shards.sorted_data.dtype}", file=sys.stderr, flush=True)

        for p in (16, 48):
            t0 = time.time()
            d, i = mg.search(idx, jnp.asarray(q), K, n_probes=p)
            jax.block_until_ready(d)
            rec = recall(i)
            line = {"phase": "mg_ivf_flat_100m", "n": N, "shards": 8,
                    "rows_per_shard": int(per_shard[1]), "n_probes": p,
                    "recall@10": round(rec, 4),
                    "search_s": round(time.time() - t0, 1),
                    "build_s": round(build_s, 1)}
            print(json.dumps(line), flush=True)

        # ---- exact re-rank arm (refine_host.hpp analog): int8 shard ranking
        # proposes CAND candidates through the mg merge; the exact f32 re-rank
        # gathers only candidate rows from the host memmap. This is the
        # BASELINE config-5 >=0.95 floor row at full 100M shape. ----
        for p in (48,):
            t0 = time.time()
            _, cand = mg.search(idx, jnp.asarray(q), CAND, n_probes=p)
            _, ri = _refine.refine_host(x, q, np.asarray(cand), K)
            rec = recall(ri)
            line = {"phase": "mg_ivf_flat_100m_refined", "n": N, "shards": 8,
                    "rows_per_shard": int(per_shard[1]), "n_probes": p,
                    "cand": CAND, "recall@10": round(rec, 4),
                    "search_s": round(time.time() - t0, 1)}
            print(json.dumps(line), flush=True)

        # ---- fused-scan arm: the SAME fused Pallas kernel single-chip serves
        # with, reached under shard_map (snmg.cuh:283 parity; interpret mode
        # on the CPU mesh) ----
        if os.environ.get("FUSED_ARM", "1") == "1":
            t0 = time.time()
            d, i = mg.search(idx, jnp.asarray(q), K, n_probes=16,
                             scan_algo="fused")
            jax.block_until_ready(d)
            rec = recall(i)
            line = {"phase": "mg_ivf_flat_100m_fused_scan", "n": N, "shards": 8,
                    "n_probes": 16, "recall@10": round(rec, 4),
                    "search_s": round(time.time() - t0, 1)}
            print(json.dumps(line), flush=True)

        del idx

    # ---- mg IVF-PQ arm (config 5 names sharded CAGRA + IVF-PQ;
    # mg_ivf_pq.h + snmg.cuh:127-166): per-shard streaming PQ build,
    # merge, then exact host re-rank ----
    if os.environ.get("IVF_PQ", "1") == "1":
        t0 = time.time()
        idx_pq = mg.build_streaming(
            lambda i: x[i * SLICE : (i + 1) * SLICE],
            n_slices,
            algo="ivf_pq",
            n_lists=N_LISTS,
            pq_dim=int(os.environ.get("PQ_DIM", 48)),
            trainset_rows=250_000,
            kmeans_n_iters=4,
            seed=0,
        )
        jax.block_until_ready(idx_pq.shards.sorted_codes)
        build_pq_s = time.time() - t0
        print(f"# mg ivf_pq build: {build_pq_s:.0f}s", file=sys.stderr,
              flush=True)
        for p in (16, 48):
            t0 = time.time()
            d, i = mg.search(idx_pq, jnp.asarray(q), K, n_probes=p)
            jax.block_until_ready(d)
            rec = recall(i)
            line = {"phase": "mg_ivf_pq_100m", "n": N, "shards": 8,
                    "n_probes": p, "recall@10": round(rec, 4),
                    "search_s": round(time.time() - t0, 1),
                    "build_s": round(build_pq_s, 1)}
            print(json.dumps(line), flush=True)
        t0 = time.time()
        _, cand = mg.search(idx_pq, jnp.asarray(q), CAND, n_probes=48)
        _, ri = _refine.refine_host(x, q, np.asarray(cand), K)
        rec = recall(ri)
        line = {"phase": "mg_ivf_pq_100m_refined", "n": N, "shards": 8,
                "n_probes": 48, "cand": CAND, "recall@10": round(rec, 4),
                "search_s": round(time.time() - t0, 1)}
        print(json.dumps(line), flush=True)
        del idx_pq

    if os.environ.get("CAGRA", "1") == "1":
        n2 = min(1_000_000, N)
        x2 = np.asarray(x[:n2], np.float32)
        q2 = x2[rng.integers(0, n2, NQ)] + 0.01 * rng.standard_normal(
            (NQ, D)).astype(np.float32)
        d = (q2 * q2).sum(1)[:, None] + (x2 * x2).sum(1)[None, :] \
            - 2.0 * (q2 @ x2.T)
        gti2 = np.argsort(d, axis=1)[:, :K]
        t0 = time.time()
        idx2 = mg.build(x2, algo="cagra", mode="sharded",
                        intermediate_graph_degree=48, graph_degree=24,
                        seed=0)
        build_s = time.time() - t0
        t0 = time.time()
        dv, iv = mg.search(idx2, jnp.asarray(q2), K, itopk_size=96)
        jax.block_until_ready(dv)
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(np.asarray(iv), gti2)
        ]))
        line = {"phase": "mg_cagra_1m", "n": n2, "shards": 8,
                "recall@10": round(rec, 4),
                "search_s": round(time.time() - t0, 1),
                "build_s": round(build_s, 1)}
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
