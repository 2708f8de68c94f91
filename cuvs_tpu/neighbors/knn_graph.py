"""All-neighbors k-NN graph construction (CAGRA's build substrate).

Reference: ``cuvs::neighbors::all_neighbors``
(/root/reference/cpp/include/cuvs/neighbors/all_neighbors.hpp:25-45) with
backends brute_force / ivf_pq / nn_descent, and CAGRA's build_knn_graph
(cpp/src/neighbors/detail/cagra/cagra_build.cuh:1629 IVF-PQ path — build,
batched self-search, refine re-rank).

TPU-native: the brute-force path is exact tiled MXU matmul self-search
(fastest below ~200k rows); the ivf_pq path is build + batched self-search
+ exact refine (the scalable default, same shape as the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import brute_force as bf
from cuvs_tpu.neighbors import ivf_pq as ivfpq
from cuvs_tpu.neighbors import refine as rf


def _drop_self(ids, dists, k: int):
    """Remove each row's self-match and keep k columns.

    ids/dists have k+1 columns; self is *usually* column 0 but ties can
    reorder, so mask any column equal to the row id.
    """
    n = ids.shape[0]
    rows = jnp.arange(n, dtype=ids.dtype)[:, None]
    is_self = ids == rows
    # push self (and only the first occurrence) to the end by +inf distance
    d = jnp.where(is_self, jnp.inf, dists)
    order = jnp.argsort(d, axis=1)[:, :k]
    return (
        jnp.take_along_axis(ids, order, axis=1),
        jnp.take_along_axis(d, order, axis=1),
    )


def build_knn_graph(
    dataset,
    k: int,
    metric="sqeuclidean",
    algo: str = "auto",
    query_batch: int = 4096,
    ivf_pq_params: Optional[ivfpq.IndexParams] = None,
    refine_ratio: float = 2.0,
    seed: int = 0,
    compute_dtype=None,
    recall_target=None,
    nn_descent_params=None,
    n_probes: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN graph over the dataset (self-edges removed).

    Returns (neighbors [n, k] int32 sorted by distance, distances [n, k]).
    algo: "brute_force" | "nn_descent" | "ivf_pq" | "auto" — brute force
    below 150k rows (the MXU makes exact all-pairs fastest there),
    nn_descent above (mirroring the reference's heuristic at
    cagra_build.cuh:2208-2219).
    """
    dataset = jnp.asarray(dataset)
    n, d = dataset.shape
    metric = normalize_metric(metric)
    if algo == "auto":
        # exact below 150k; partitioned exact above (cluster + halo blocks
        # of full MXU matmuls — far better HBM reuse than the gather-bound
        # nn_descent local join, so it is both faster AND exact-per-block)
        algo = "brute_force" if n <= 150_000 else "partitioned"

    if algo == "partitioned":
        from cuvs_tpu.neighbors import all_neighbors

        overlap = 2
        target_rows = 32_768  # padded per-cluster block size
        n_clusters = max(overlap + 1, -(-n * overlap // target_rows))
        return all_neighbors.build(
            dataset, k,
            all_neighbors.AllNeighborsParams(
                algo="brute_force", n_clusters=n_clusters,
                overlap_factor=overlap, metric=metric, seed=seed,
            ),
            compute_dtype=compute_dtype if compute_dtype is not None else jnp.float32,
            recall_target=recall_target,
        )

    if algo == "brute_force":
        import jax.numpy as _jnp

        cd = compute_dtype if compute_dtype is not None else _jnp.float32
        index = bf.build(dataset, metric=metric)
        all_ids = []
        all_dists = []
        for s in range(0, n, query_batch):
            q = dataset[s : s + query_batch]
            dd, ii = bf.search(index, q, k + 1, compute_dtype=cd,
                               recall_target=recall_target)
            all_ids.append(ii)
            all_dists.append(dd)
        ids = jnp.concatenate(all_ids, axis=0)
        dists = jnp.concatenate(all_dists, axis=0)
        return _drop_self(ids, dists, k)

    if algo == "nn_descent":
        from cuvs_tpu.neighbors import nn_descent

        import jax.numpy as _jnp

        nd_params = nn_descent_params or nn_descent.IndexParams(
            graph_degree=k,
            intermediate_graph_degree=max(k + 16, int(k * 1.5)),
            metric=metric,
            seed=seed,
        )
        return nn_descent.build(
            dataset,
            nd_params,
            compute_dtype=compute_dtype if compute_dtype is not None else _jnp.float32,
        )

    if algo == "ivf_pq":
        if ivf_pq_params is None:
            n_lists = max(32, min(4096, int(n ** 0.5)))
            ivf_pq_params = ivfpq.IndexParams(
                n_lists=n_lists, metric=metric, seed=seed,
                kmeans_trainset_fraction=min(1.0, 100_000 / max(n, 1)),
            )
        index = ivfpq.build(dataset, ivf_pq_params)
        n_cand = int((k + 1) * refine_ratio)
        n_probes = n_probes or max(20, ivf_pq_params.n_lists // 20)
        all_ids = []
        all_dists = []
        for s in range(0, n, query_batch):
            q = dataset[s : s + query_batch]
            _, cand = ivfpq.search(index, q, n_cand, n_probes=n_probes)
            dd, ii = rf.refine(dataset, q, cand, k + 1, metric=metric)
            all_ids.append(ii)
            all_dists.append(dd)
        ids = jnp.concatenate(all_ids, axis=0)
        dists = jnp.concatenate(all_dists, axis=0)
        return _drop_self(ids, dists, k)

    raise ValueError(f"unknown knn graph algo {algo!r}")
