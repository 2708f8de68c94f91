"""Multi-chip sharded search example (SNMG analog over a jax Mesh).

Runs on any device count — including a CPU-simulated mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=. python examples/multi_chip_example.py
"""

import numpy as np

import jax

from cuvs_tpu import mg


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    dataset = rng.standard_normal((40_000, 64)).astype(np.float32)
    queries = rng.standard_normal((128, 64)).astype(np.float32)

    # SHARDED: each device holds + searches a dataset shard; results are
    # merged with one all_gather over ICI.
    index = mg.build(dataset, algo="ivf_flat", mode="sharded", n_lists=64)
    dists, ids = mg.search(index, queries, k=10, n_probes=16)
    print("sharded ivf_flat top-1:", np.asarray(ids[:5, 0]))

    # REPLICATED: the index is copied per device; the query batch is split.
    rep = mg.build(dataset[:10_000], algo="brute_force", mode="replicated")
    dists, ids = mg.search(rep, queries, k=10)
    print("replicated brute-force top-1:", np.asarray(ids[:5, 0]))

    # distributed k-means with psum-allreduce
    centers, inertia = mg.kmeans_fit(dataset, 16)
    print("mg kmeans inertia:", float(inertia))

    # STREAMING SHARDED: for datasets beyond n_chips x HBM — host slices
    # are assigned to shards, each shard builds an int8 streaming index
    # and is committed straight to its device (no single-device gather).
    n_slices, rows = 8, 5_000
    slices = [
        rng.standard_normal((rows, 64)).astype(np.float32)
        for _ in range(n_slices)
    ]
    big = mg.build_streaming(lambda i: slices[i], n_slices, n_lists=32,
                             trainset_rows=8_000)
    dists, ids = mg.search(big, queries, k=10, n_probes=16)
    print("streaming sharded ivf_flat top-1:", np.asarray(ids[:5, 0]))


if __name__ == "__main__":
    main()
