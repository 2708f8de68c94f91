"""Vamana / DiskANN example (examples/cpp/src/vamana_example.cu analog).

Build a Vamana graph, search it, write the DiskANN file format.
Run: PYTHONPATH=. python examples/vamana_example.py
"""

import os
import tempfile

import numpy as np

from cuvs_tpu.neighbors import vamana


def main():
    rng = np.random.default_rng(0)
    dataset = rng.standard_normal((20_000, 64)).astype(np.float32)
    queries = rng.standard_normal((50, 64)).astype(np.float32)

    # --- build (RobustPrune with alpha-slack, batched inserts) ---
    index = vamana.build(dataset, graph_degree=32, visited_size=64, alpha=1.2,
                         seed=0)
    print(f"built: graph degree {index.graph.shape[1]}, "
          f"medoid {int(index.medoid)}")

    # --- search (greedy graph traversal) ---
    dists, ids = vamana.search(index, queries, 10, itopk_size=64)
    print(f"top-1 of query 0: id={int(ids[0, 0])} dist={float(dists[0, 0]):.3f}")

    # --- DiskANN-format serialize / reload ---
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vamana.diskann")
        vamana.serialize(index, path)
        print(f"DiskANN file: {os.path.getsize(path)} bytes")
        index2 = vamana.deserialize(path, dataset)
    d2, i2 = vamana.search(index2, queries, 10, itopk_size=64)
    assert np.array_equal(np.asarray(ids), np.asarray(i2))
    print("reloaded graph serves identically")


if __name__ == "__main__":
    main()
