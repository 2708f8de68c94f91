"""Dynamic batching example: request-level aggregation in front of CAGRA.

Reference analog: examples/cpp/src/dynamic_batching_example.cu — many
client threads submit single queries; the batcher aggregates them into
fixed-shape device calls.

Run: python examples/dynamic_batching_example.py
"""

import threading
import time

import numpy as np

from cuvs_tpu.neighbors import cagra, dynamic_batching


def main():
    rng = np.random.default_rng(0)
    n, dim, k = 50_000, 64, 10
    x = rng.standard_normal((n, dim), dtype=np.float32)

    print("building CAGRA index...")
    index = cagra.build(x, intermediate_graph_degree=64, graph_degree=32, seed=0)

    batcher = dynamic_batching.wrap(
        cagra, index, dim=dim,
        params=dynamic_batching.BatchParams(
            k=k, max_batch_size=64, dispatch_timeout_ms=5.0,
        ),
        itopk_size=64,
    )

    # 16 client threads, 8 single-query requests each
    results = {}

    def client(cid):
        for r in range(8):
            q = x[rng.integers(0, n)][None] + 0.01
            d, i = batcher.search(q, timeout=60)
            results[(cid, r)] = i[0, 0]

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"128 requests in {time.time()-t0:.2f}s "
          f"(backend={'native' if batcher._native else 'python'})")
    batcher.close()


if __name__ == "__main__":
    main()
