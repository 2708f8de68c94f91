"""IVF-PQ + refinement example (examples/cpp/src/ivf_pq_example.cu analog).

Run: PYTHONPATH=. python examples/ivf_pq_example.py
"""

import numpy as np

from cuvs_tpu.neighbors import ivf_pq, refine


def main():
    rng = np.random.default_rng(0)
    dataset = rng.standard_normal((50_000, 96)).astype(np.float32)
    queries = rng.standard_normal((256, 96)).astype(np.float32)
    k = 10

    index = ivf_pq.build(
        dataset, ivf_pq.IndexParams(n_lists=256, pq_dim=48, pq_bits=8)
    )
    print(f"built IVF-PQ: {index.n_lists} lists, pq_dim={index.pq_dim}, "
          f"codes take {index.sorted_codes.nbytes / dataset.nbytes:.1%} of raw")

    # over-fetch candidates with the compressed scan, re-rank exactly
    _, candidates = ivf_pq.search(index, queries, k * 4, n_probes=32)
    dists, ids = refine.refine(dataset, queries, candidates, k)
    print("refined top-1 ids:", np.asarray(ids[:5, 0]))


if __name__ == "__main__":
    main()
