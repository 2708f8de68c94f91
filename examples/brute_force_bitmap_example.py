"""Bitmap-filtered brute force (examples/cpp/src/brute_force_bitmap.cu
analog).

A bitmap is a per-(query, row) mask — each query sees its own allowed
subset (a bitset is the shared-across-queries special case).
Run: PYTHONPATH=. python examples/brute_force_bitmap_example.py
"""

import numpy as np

from cuvs_tpu.core import bitset
from cuvs_tpu.neighbors import brute_force, filters


def main():
    rng = np.random.default_rng(0)
    n, nq = 10_000, 8
    dataset = rng.standard_normal((n, 32)).astype(np.float32)
    queries = rng.standard_normal((nq, 32)).astype(np.float32)

    index = brute_force.build(dataset)

    # per-query allowed rows: query i may only see rows with id % nq == i
    mask = (np.arange(n)[None, :] % nq) == np.arange(nq)[:, None]
    bitmap = bitset.bitmap_from_mask(mask)

    dists, ids = brute_force.search(
        index, queries, 5, prefilter=filters.bitmap_filter(bitmap))
    ids = np.asarray(ids)
    for i in range(nq):
        assert np.all(ids[i] % nq == i), (i, ids[i])
    print(f"every result respects its query's bitmap: "
          f"query 0 -> ids {ids[0].tolist()}")

    # shared filter: drop the first half of the dataset for ALL queries
    bits = bitset.bitset_from_mask(np.arange(n) >= n // 2)
    _, ids2 = brute_force.search(
        index, queries, 5, prefilter=filters.bitset_filter(bits))
    assert np.asarray(ids2).min() >= n // 2
    print("bitset filter (shared across queries) also holds")


if __name__ == "__main__":
    main()
