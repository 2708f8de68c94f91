"""DEEP-100M-shape single-chip benchmark (BASELINE config 5, one v5e).

Flow (docs/scale.md):
  1. generate 100M x 96 synthetic host-side (torch RNG + matmul — the
     only host path fast enough on this box; the SAME array later serves
     as the exact f32 refine source, which is why generation cannot
     happen on-device);
  2. `ivf_flat.build_streaming` (host mode): slices upload for labeling,
     int8 rows land in their final grouped positions — the 38 GB f32
     dataset never exists on the device;
  3. exact ground truth by streaming bf16 brute force over slices;
  4. serve: fused int8 cluster-major scan (ops/ivf_scan_pallas.py) at
     n_probes in {128, 256}, then + host-side exact re-rank
     (refine.refine_host — gathers only the candidate rows from host
     RAM, ~60 MB per 4096-query batch, riding the fast upload path).

Prints one line per config: recall@10 + QPS. Expect ~12 GB HBM for the
index and ~45 GB host RAM. Reproduces the docs/benchmarks.md 100M table.
"""

import os
import sys
import time

# runnable as `python scripts/<name>.py` from anywhere: put the repo
# root (this file's parent's parent) on sys.path for cuvs_tpu imports
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np

N = int(os.environ.get("N_ROWS", 100_000_000))
D = 96
NQ = int(os.environ.get("NQ", 4096))
K = 10
SLICE = 2_000_000
N_LISTS = int(os.environ.get("N_LISTS", 16384))
CAND = int(os.environ.get("CAND", 40))


CACHE = os.environ.get("DATASET_CACHE", "/root/x100m_f32.npy")


def main():
    import jax
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import brute_force, ivf_flat, refine
    from cuvs_tpu.ops import bf_topk_pallas
    from cuvs_tpu.selection.select_k import merge_parts

    # fail in SECONDS, not after hours of datagen, if the env lost the
    # device plugin (PYTHONPATH must keep /root/.axon_site). GEN_ONLY
    # stages the dataset cache without ever touching the device.
    gen_only = os.environ.get("GEN_ONLY") == "1"
    if gen_only:
        jax.config.update("jax_platforms", "cpu")
    else:
        backend = jax.default_backend()
        print(f"# backend: {backend} {jax.devices()}",
              file=sys.stderr, flush=True)
        if os.environ.get("REQUIRE_TPU", "1") == "1" and backend != "tpu":
            raise SystemExit(f"refusing to run on backend {backend!r}")

    rng = np.random.Generator(np.random.SFC64(0))
    r = D // 4
    proj = (rng.standard_normal((r, D)).astype(np.float32) / np.sqrt(r))

    # host datagen rides torch (numpy's SFC64 gaussians run ~2M/s on this
    # single weak core). Measured on the idle core: ~1.1M gaussians/s via
    # numpy, torch ~10x that — still ~35 min for the 2.4B base gaussians,
    # so (a) the 38 GB array persists to a disk memmap and any rerun skips
    # datagen entirely (the file also feeds refine_host from page cache),
    # (b) the 9.6B-gaussian noise term reuses a 4M-row pool at random
    # offsets (base rows stay unique, so no duplicate dataset rows).
    import torch

    torch.manual_seed(0)
    proj_t = torch.from_numpy(np.ascontiguousarray(proj, np.float32))
    # queries FIRST so they are identical between fresh and cached runs
    q = (torch.randn(NQ, r) @ proj_t + 0.05 * torch.randn(NQ, D)).numpy()
    t0 = time.time()
    if os.path.exists(CACHE):
        x = np.lib.format.open_memmap(CACHE, mode="r")
        assert x.shape == (N, D), x.shape
        print(f"# dataset from cache {CACHE}", file=sys.stderr, flush=True)
    else:
        x = np.lib.format.open_memmap(
            CACHE + ".tmp", mode="w+", dtype=np.float32, shape=(N, D))
        pool_rows = 4_000_000
        noise = (0.05 * torch.randn(pool_rows + SLICE, D)).numpy()
        off_rng = np.random.Generator(np.random.SFC64(7))
        for s in range(0, N, SLICE):
            e = min(s + SLICE, N)
            xt = torch.from_numpy(x[s:e])
            torch.matmul(torch.randn(e - s, r), proj_t, out=xt)
            o = int(off_rng.integers(0, pool_rows))
            x[s:e] += noise[o : o + (e - s)]
            if s % (10 * SLICE) == 0:
                print(f"# datagen {e/1e6:.0f}M {time.time()-t0:.0f}s",
                      file=sys.stderr, flush=True)
        x.flush()
        os.rename(CACHE + ".tmp", CACHE)
        x = np.lib.format.open_memmap(CACHE, mode="r")
    print(f"# host data ready: {time.time()-t0:.0f}s "
          f"({x.nbytes/2**30:.1f} GB)", file=sys.stderr, flush=True)
    if gen_only:  # cache staged; the chip was never touched
        return

    # ---- streaming build: only int8 rows + one slice ever on device ----
    t0 = time.time()
    n_slices = -(-N // SLICE)
    idx = ivf_flat.build_streaming(
        lambda i: x[i * SLICE : (i + 1) * SLICE],
        n_slices,
        n_lists=N_LISTS,
        trainset_rows=2_000_000,
        kmeans_n_iters=10,
        seed=0,
    )
    jax.block_until_ready(idx.sorted_data)
    build_s = time.time() - t0
    sizes = np.asarray(idx.lists.sizes)
    print(f"# build_streaming: {build_s:.0f}s window={idx.window} "
          f"max/avg={sizes.max()/sizes.mean():.2f}",
          file=sys.stderr, flush=True)

    # ---- exact GT: streaming bf16 fused scans over host slices ----
    t0 = time.time()
    qd = jax.device_put(q)
    parts_d, parts_i = [], []
    xc_d, xc_i = [], []  # 256-query exact (k-round masked max) cross-check
    NXC = min(256, NQ)
    for s in range(0, N, SLICE * 2):
        e = min(s + SLICE * 2, N)
        blk = jax.device_put(x[s:e]).astype(jnp.bfloat16)
        d_, i_ = bf_topk_pallas.search(
            blk, None, qd, K, compute_dtype=jnp.bfloat16, exact=False)
        parts_d.append(np.asarray(d_))
        parts_i.append(np.asarray(i_) + s)
        dx, ix = bf_topk_pallas.search(
            blk, None, qd[:NXC], K, compute_dtype=jnp.bfloat16, exact=True)
        xc_d.append(np.asarray(dx))
        xc_i.append(np.asarray(ix) + s)
        del blk
    gtd, gti = merge_parts(parts_d, parts_i, K, select_min=True)
    gti = np.asarray(gti)
    xd, xi = merge_parts(xc_d, xc_i, K, select_min=True)
    # GT discipline (naive_knn.cuh:95 analog): the serving GT uses the
    # approx bin select; assert it agrees with an exact per-tile top-k
    # pass on a 256-query sample before any >=0.95 floor is claimed
    agree = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K
        for a, b in zip(gti[:NXC], np.asarray(xi))
    ]))
    print(f"# ground truth: {time.time()-t0:.0f}s "
          f"(exact-crosscheck agreement {agree:.4f})",
          file=sys.stderr, flush=True)
    if agree < 0.999:
        gti[:NXC] = np.asarray(xi)  # trust the exact rows; flag loudly
        print("# WARNING: approx GT disagreed with exact cross-check",
              file=sys.stderr, flush=True)

    def recall(i):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(np.asarray(i), gti)
        ]))

    rows = []

    from cuvs_tpu.bench.measure import timed_qps

    def bench(label, fn, reps=3):
        dv, di = fn()
        jax.block_until_ready(jax.tree.leaves(dv)[0]
                              if not hasattr(dv, "block_until_ready") else dv)
        rec = recall(di)
        # dependency-chained reps: the relay elides repeated executions
        # whose outputs are dropped (cuvs_tpu/bench/measure.py)
        qps = timed_qps(fn, NQ, reps=reps)
        print(f"{label}: recall@10={rec:.4f} qps={qps:.0f}", flush=True)
        rows.append({"config": label, "recall@10": round(rec, 4),
                     "qps": round(qps, 1)})

    for p in (128, 256):
        sp = ivf_flat.SearchParams(n_probes=p, scan_algo="fused",
                                   recall_target=0.97)
        bench(f"int8 fused p={p}", lambda: ivf_flat.search(idx, qd, K, sp))

    # ---- + host-side exact re-rank (refine_host.hpp semantics) ----
    for p in (128, 256):
        sp = ivf_flat.SearchParams(n_probes=p, scan_algo="fused",
                                   recall_target=0.97)

        def rsearch():
            _, cand = ivf_flat.search(idx, qd, CAND, sp)
            return refine.refine_host(x, q, np.asarray(cand), K)

        bench(f"int8 fused p={p} + host refine", rsearch)

    import json

    out = os.environ.get("OUT_JSON", "")
    if out:
        with open(out, "w") as f:
            json.dump({"n": N, "dim": D, "nq": NQ, "n_lists": N_LISTS,
                       "cand": CAND, "build_s": round(build_s, 1),
                       "gt_crosscheck_agreement": round(agree, 4),
                       "rows": rows}, f, indent=1)
        print(f"# wrote {out}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
