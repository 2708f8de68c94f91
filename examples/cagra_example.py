"""CAGRA end-to-end example (examples/cpp/src/cagra_example.cu analog).

Build a graph index, search it, filter it, save/load it.
Run: PYTHONPATH=. python examples/cagra_example.py
"""

import numpy as np

from cuvs_tpu.neighbors import cagra, filters
from cuvs_tpu.utils import serialize


def main():
    rng = np.random.default_rng(0)
    dataset = rng.standard_normal((10_000, 64)).astype(np.float32)
    queries = rng.standard_normal((100, 64)).astype(np.float32)

    # --- build ---
    index = cagra.build(
        dataset,
        cagra.IndexParams(intermediate_graph_degree=64, graph_degree=32),
    )
    print(f"built CAGRA index: {index.size} rows, degree {index.graph_degree}")

    # --- search ---
    dists, ids = cagra.search(index, queries, k=10, itopk_size=64)
    print("first query neighbors:", np.asarray(ids[0]))

    # --- prefiltered search: only even row ids are allowed ---
    flt = filters.udf_filter(lambda qid, sample_id: sample_id % 2 == 0)
    _, ids_f = cagra.search(index, queries, k=10, prefilter=flt)
    assert (np.asarray(ids_f) % 2 == 0).all()
    print("filtered search respects the UDF filter")

    # --- serialize / deserialize ---
    serialize.save("/tmp/cagra_index.npz", index)
    loaded = serialize.load("/tmp/cagra_index.npz", expected_kind="cagra")
    _, ids2 = cagra.search(loaded, queries, k=10, itopk_size=64)
    assert (np.asarray(ids2) == np.asarray(ids)).all()
    print("serialize round-trip OK")


if __name__ == "__main__":
    main()
