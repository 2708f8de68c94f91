"""IVF-PQ at 10M x 96 through the fused Pallas PQ scan (BASELINE
config 3 shape: DEEP-10M-class, PQ + refine).

Round-2 state: the unfused decode-and-dot served 0.6k QPS @ 0.917 — the
reconstruction gather and the HBM order tensor dominated. The fused
kernel (ops/ivf_scan_pallas.py::fused_pq_scan) decodes in VMEM with
one-hot MXU matmuls; this script records its recall/QPS ladder plus an
exact bf16 device refine pass (refine ratio 4).

Memory plan (fits a 16 GB v5e chip): the f32 dataset lives on the HOST
and feeds ivf_pq.build_streaming slice by slice (the bigann-1B-regime
builder); the device keeps only a bf16 copy (1.9 GB) for ground truth +
refine, plus the packed PQ codes (~1 GB with the serving layout).

Prints one line per config: recall@10 + QPS over 4096 queries.
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

N = int(os.environ.get("N_ROWS", 10_000_000))
D = 96
NQ = int(os.environ.get("NQ", 4096))
K = 10
N_LISTS = int(os.environ.get("N_LISTS", 4096))
CAND = int(os.environ.get("CAND", 40))
PQ_DIM = int(os.environ.get("PQ_DIM", 48))
# 4-bit x pq_dim=96 = the same 48 B/vec as 8-bit x 48, but the fused
# scan's ADC floor (S*book MACs/row) drops 8x: book 256 -> 16
PQ_BITS = int(os.environ.get("PQ_BITS", 8))
SLICE = int(os.environ.get("SLICE", 1_000_000))


def main():
    import jax
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import ivf_pq, refine
    from cuvs_tpu.ops import bf_topk_pallas

    print(f"# {jax.devices()}", file=sys.stderr, flush=True)
    r = D // 4
    proj = jax.random.normal(jax.random.PRNGKey(1), (r, D), jnp.float32)
    proj = proj / np.sqrt(r)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen_slice(key, rows):
        kz, kn = jax.random.split(key)
        z = jax.random.normal(kz, (rows, r), jnp.float32)
        return z @ proj + 0.05 * jax.random.normal(kn, (rows, D), jnp.float32)

    n_slices = -(-N // SLICE)
    host = np.empty((N, D), np.float32)
    x16_parts = []
    for i in range(n_slices):
        rows = min(SLICE, N - i * SLICE)
        sl = gen_slice(jax.random.PRNGKey(100 + i), rows)
        host[i * SLICE : i * SLICE + rows] = np.asarray(sl)
        x16_parts.append(sl.astype(jnp.bfloat16))
        del sl
    x16 = jnp.concatenate(x16_parts, axis=0)
    del x16_parts
    q = jax.block_until_ready(gen_slice(jax.random.PRNGKey(9), NQ))
    print("# data ready", file=sys.stderr, flush=True)

    gtd, gti = bf_topk_pallas.search(x16, None, q, K,
                                     compute_dtype=jnp.bfloat16, exact=False)
    gti = np.asarray(gti)
    print("# ground truth done", file=sys.stderr, flush=True)

    t0 = time.time()
    idx = ivf_pq.build_streaming(
        lambda i: host[i * SLICE : (i + 1) * SLICE],
        n_slices, n_lists=N_LISTS, pq_dim=PQ_DIM, pq_bits=PQ_BITS, seed=0,
    )
    jax.block_until_ready(idx.sorted_codes_t)
    print(f"# build: {time.time()-t0:.0f}s window={idx.window}",
          file=sys.stderr, flush=True)

    def recall(i):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(np.asarray(i), gti)
        ]))

    from cuvs_tpu.bench.measure import timed_qps

    def bench(label, fn, reps=3):
        _, di = fn()
        rec = recall(di)
        # dependency-chained reps: the relay elides repeated executions
        # whose outputs are dropped (cuvs_tpu/bench/measure.py)
        qps = timed_qps(fn, NQ, reps=reps)
        print(f"{label}: recall@10={rec:.4f} qps={qps:.0f}", flush=True)

    for lut, tag in ((jnp.float32, ""), (jnp.int8, " int8")):
        for p in (64, 128, 256):
            sp = ivf_pq.SearchParams(n_probes=p, scan_algo="fused",
                                     lut_dtype=lut)
            bench(f"pq fused{tag} p={p}",
                  lambda: ivf_pq.search(idx, q, K, sp))

        for p in (64, 128, 192):
            sp = ivf_pq.SearchParams(n_probes=p, scan_algo="fused",
                                     lut_dtype=lut)

            def rsearch():
                _, cand = ivf_pq.search(idx, q, CAND, sp)
                return refine.refine(x16, q, cand, K,
                                     compute_dtype=jnp.bfloat16)

            bench(f"pq fused{tag} p={p} + bf16 refine", rsearch)


if __name__ == "__main__":
    main()
