"""ACE out-of-core build -> HNSW export (cagra_hnsw_ace_example.cu +
hnsw_ace_example.cu analog).

ACE (Augmented Core Extraction) builds a CAGRA graph bigger than device
memory one partition (+halos) at a time; the result exports as a vanilla
hnswlib file for CPU serving.
Run: PYTHONPATH=. python examples/hnsw_ace_example.py
"""

import os
import tempfile

import numpy as np

from cuvs_tpu.neighbors import cagra, hnsw


def main():
    rng = np.random.default_rng(0)
    dataset = rng.standard_normal((30_000, 48)).astype(np.float32)
    queries = rng.standard_normal((50, 48)).astype(np.float32)

    with tempfile.TemporaryDirectory() as d:
        # --- ACE build: 4 partitions, graph spilled to a disk memmap ---
        index = cagra.build_ace(
            dataset,
            npartitions=4,
            overlap=2,
            graph_degree=32,
            build_dir=os.path.join(d, "ace"),
            seed=0,
        )
        print(f"ACE graph built: {tuple(index.graph.shape)} "
              f"(spilled to {os.path.join(d, 'ace', 'ace_graph.npy')})")

        # --- serve directly on the accelerator ---
        dists, ids = cagra.search(index, queries, 10, itopk_size=64)
        print(f"device search top-1 of query 0: id={int(ids[0, 0])}")

        # --- export as an hnswlib file with a real hierarchy ---
        path = os.path.join(d, "ace.hnswlib")
        hnsw.from_cagra(index, path, hnsw.HnswParams(hierarchy="cpu"))
        print(f"hnswlib file: {os.path.getsize(path)} bytes")

        # --- reload and search through the HNSW reader ---
        hidx = hnsw.load(path)
        d2, i2 = hnsw.search(hidx, queries, 10, ef=64)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(ids), np.asarray(i2))
        ])
        print(f"hnsw-vs-device top-10 overlap: {overlap:.2f}")


if __name__ == "__main__":
    main()
