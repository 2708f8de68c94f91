"""The TPU serving matrix in one script: pick the right tier by scale.

docs/benchmarks.md measures (one v5e chip):
  <= 1M rows   fused exact brute force        ~300k QPS @ 0.98
  1-10M        IVF-Flat fused Pallas scan      ~50k QPS @ 0.95
  > HBM        int8 streaming build + host-side exact re-rank

This example runs all three tiers at a laptop-friendly scale so the API
shapes are visible; the configs scale up unchanged (scripts/run_100m.py
is the 100M incarnation of tier 3).
Run: PYTHONPATH=. python examples/scale_serving_example.py
"""

import numpy as np

from cuvs_tpu.neighbors import brute_force, ivf_flat, offload


def make_data(n, d, rng):
    r = max(4, d // 4)
    proj = rng.standard_normal((r, d)).astype(np.float32) / np.sqrt(r)
    return (rng.standard_normal((n, r), dtype=np.float32) @ proj
            + 0.05 * rng.standard_normal((n, d), dtype=np.float32))


def recall(ids, gt):
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / gt.shape[1]
        for a, b in zip(np.asarray(ids), gt)
    ]))


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = make_data(60_000, 64, rng)
    q = make_data(64, 64, rng)
    k = 10

    # ground truth = tier-1 exact search
    bf = brute_force.build(x)
    gtd, gti = brute_force.search(bf, q, k)
    gti = np.asarray(gti)

    # --- tier 1 (<= 1M rows): fused exact scan, bf16 compute ---
    d1, i1 = brute_force.search(bf, q, k, compute_dtype=jnp.bfloat16,
                                recall_target=0.97)
    print(f"tier 1 exact bf16: recall@10={recall(i1, gti):.3f}")

    # --- tier 2 (1-10M rows): IVF-Flat, fused cluster-major scan on TPU ---
    idx = ivf_flat.build(x, n_lists=256, seed=0,
                         storage_dtype=jnp.bfloat16)
    sp = ivf_flat.SearchParams(n_probes=64)  # + scan_algo="fused" on TPU
    d2, i2 = ivf_flat.search(idx, q, k, sp)
    print(f"tier 2 ivf bf16 p=64: recall@10={recall(i2, gti):.3f}")

    # --- tier 3 (dataset >> HBM): int8 device ranking + host re-rank ---
    # the f32 dataset stays in host RAM; the device holds int8 rows only
    hidx = offload.build_host_refined(x, algo="ivf_flat", n_lists=256,
                                      seed=0, storage_dtype=np.int8)
    d3, i3 = offload.search_refined(hidx, q, k, refine_ratio=4, n_probes=64)
    print(f"tier 3 int8 + host refine: recall@10={recall(i3, gti):.3f}")


if __name__ == "__main__":
    main()
