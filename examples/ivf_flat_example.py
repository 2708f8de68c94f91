"""IVF-Flat end-to-end example (examples/cpp/src/ivf_flat_example.cu analog).

Build, search (fused Pallas scan on TPU), extend with new vectors,
save/load.
Run: PYTHONPATH=. python examples/ivf_flat_example.py
"""

import os
import tempfile

import numpy as np

from cuvs_tpu.neighbors import ivf_flat
from cuvs_tpu.utils import serialize


def main():
    rng = np.random.default_rng(0)
    dataset = rng.standard_normal((50_000, 64)).astype(np.float32)
    queries = rng.standard_normal((100, 64)).astype(np.float32)

    # --- build (n_lists clusters via balanced hierarchical k-means) ---
    index = ivf_flat.build(dataset, n_lists=128, metric="sqeuclidean", seed=0)
    print(f"built: {index.size} vectors in {index.n_lists} lists")

    # --- search: n_probes trades recall for speed; scan_algo="fused"
    # uses the Pallas cluster-major kernel on TPU (auto elsewhere) ---
    params = ivf_flat.SearchParams(n_probes=16)
    dists, ids = ivf_flat.search(index, queries, 10, params)
    print(f"top-1 of query 0: id={int(ids[0, 0])} dist={float(dists[0, 0]):.3f}")

    # --- extend: append vectors without a rebuild ---
    more = rng.standard_normal((1_000, 64)).astype(np.float32)
    index = ivf_flat.extend(index, more)
    print(f"extended to {index.size} vectors")

    # --- save / load ---
    d1, i1 = ivf_flat.search(index, queries, 10, params)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ivf_flat.cuvs")
        serialize.save(path, index)
        index2 = serialize.load(path)
    d2, i2 = ivf_flat.search(index2, queries, 10, params)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    print("reloaded index serves identically")


if __name__ == "__main__":
    main()
