"""Prefiltered search example: bitset, bitmap, and UDF filters.

Reference analog: examples/cpp/src/*filter*.cu (bitmap-filtered brute
force, CAGRA filter UDF). Filters apply to every index family here.

Run: python examples/filtered_search_example.py
"""

import numpy as np

from cuvs_tpu.neighbors import brute_force, cagra, filters


def main():
    rng = np.random.default_rng(0)
    n, dim, k = 20_000, 32, 5
    x = rng.standard_normal((n, dim), dtype=np.float32)
    q = rng.standard_normal((4, dim), dtype=np.float32)

    bf = brute_force.build(x)
    index = cagra.build(x, intermediate_graph_degree=48, graph_degree=24, seed=0)

    # 1. bitset filter: one allow-list shared by all queries
    keep = rng.random(n) > 0.5
    flt = filters.from_mask(keep)
    d, i = brute_force.search(bf, q, k, prefilter=flt)
    assert keep[np.asarray(i)].all()
    print("bitset-filtered BF ok:", np.asarray(i)[0])

    d, i = cagra.search(index, q, k, prefilter=flt)
    valid = np.isfinite(np.asarray(d))
    assert keep[np.asarray(i)[valid]].all()
    print("bitset-filtered CAGRA ok:", np.asarray(i)[0])

    # 2. bitmap filter: a different allow-list PER QUERY
    bitmap = rng.random((4, n)) > 0.3
    d, i = brute_force.search(bf, q, k, prefilter=filters.from_mask(bitmap))
    for row, ids in enumerate(np.asarray(i)):
        assert bitmap[row, ids].all()
    print("bitmap-filtered BF ok")

    # 3. UDF filter: any traceable predicate over (query_id, sample_id) —
    # the JIT-LTO filter analog is just a jax-traceable callable
    flt = filters.udf_filter(lambda qid, sid: sid % 2 == 0)
    d, i = brute_force.search(bf, q, k, prefilter=flt)
    assert (np.asarray(i) % 2 == 0).all()
    print("UDF-filtered BF ok:", np.asarray(i)[0])


if __name__ == "__main__":
    main()
