"""all_neighbors: unified k-NN-graph build API with batched mode.

Reference: ``cuvs::neighbors::all_neighbors``
(/root/reference/cpp/include/cuvs/neighbors/all_neighbors.hpp:25-90):
single or batched build — cluster the data, each point assigned to its
``overlap_factor`` nearest clusters, per-cluster sub-graphs built and
merged — with backend ivf_pq / nn_descent / brute_force. Batching bounds
device memory to ~(overlap_factor/n_clusters) * n_rows rows at once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cuvs_tpu.cluster import kmeans_balanced
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric


@dataclasses.dataclass(frozen=True)
class AllNeighborsParams:
    """Mirrors all_neighbors_params (all_neighbors.hpp:40-90)."""

    algo: str = "auto"  # "brute_force" | "nn_descent" | "ivf_pq" | "auto"
    n_clusters: int = 1  # 1 = single (non-batched) build
    overlap_factor: int = 2
    metric: DistanceType = DistanceType.L2Expanded
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))
        if self.n_clusters > 1 and self.overlap_factor >= self.n_clusters:
            raise ValueError("overlap_factor must be < n_clusters")


def _single(dataset, k, params, **kw):
    if params.algo in ("brute_force", "ivf_pq", "auto"):
        from cuvs_tpu.neighbors import knn_graph

        algo = params.algo if params.algo != "auto" else "auto"
        return knn_graph.build_knn_graph(
            dataset, k, metric=params.metric, algo=algo, seed=params.seed, **kw
        )
    if params.algo == "nn_descent":
        from cuvs_tpu.neighbors import nn_descent

        return nn_descent.build(
            dataset,
            nn_descent.IndexParams(
                graph_degree=k,
                intermediate_graph_degree=max(2 * k, k + 16),
                metric=params.metric,
                seed=params.seed,
            ),
        )
    raise ValueError(f"unknown algo {params.algo!r}")


def build(
    dataset, k: int, params: Optional[AllNeighborsParams] = None, **kw
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN graph of the dataset. Returns (neighbors [n,k], distances).

    n_clusters > 1 activates the batched path: per-cluster sub-builds over
    overlapping membership, merged by distance.
    """
    if params is None:
        params = AllNeighborsParams(**{k_: v for k_, v in kw.items()
                                       if k_ in AllNeighborsParams.__dataclass_fields__})
        kw = {k_: v for k_, v in kw.items()
              if k_ not in AllNeighborsParams.__dataclass_fields__}
    dataset = np.asarray(dataset, np.float32)
    n = dataset.shape[0]
    if params.n_clusters <= 1:
        g, d = _single(dataset, k, params, **kw)
        return jnp.asarray(g), jnp.asarray(d)

    # batched: balanced cluster, assign each row to overlap_factor clusters
    c = params.n_clusters
    centers = kmeans_balanced.fit(dataset, c, seed=params.seed)
    from cuvs_tpu.distance.pairwise import pairwise_distance

    d2c = np.asarray(pairwise_distance(dataset, np.asarray(centers)))
    assign = np.argsort(d2c, axis=1)[:, : params.overlap_factor]  # [n, o]

    best_d = np.full((n, k), np.inf, np.float32)
    best_i = np.zeros((n, k), np.int64)
    for ci in range(c):
        members = np.where((assign == ci).any(axis=1))[0]
        if len(members) <= k:
            continue
        sub_g, sub_d = _single(dataset[members], min(k, len(members) - 1), params, **kw)
        sub_g = members[np.asarray(sub_g)]  # local -> global ids
        sub_d = np.asarray(sub_d)
        kk = sub_g.shape[1]
        # merge into global per-row lists
        md = np.concatenate([best_d[members], sub_d], axis=1)
        mi = np.concatenate([best_i[members], sub_g], axis=1)
        # dedup (same neighbor found in two overlapping clusters)
        order = np.argsort(mi, axis=1, kind="stable")
        mi_s = np.take_along_axis(mi, order, axis=1)
        md_s = np.take_along_axis(md, order, axis=1)
        dup = np.concatenate(
            [np.zeros((len(members), 1), bool), mi_s[:, 1:] == mi_s[:, :-1]], axis=1
        )
        md_s[dup] = np.inf
        keep = np.argsort(md_s, axis=1)[:, :k]
        best_d[members] = np.take_along_axis(md_s, keep, axis=1)
        best_i[members] = np.take_along_axis(mi_s, keep, axis=1)
    return jnp.asarray(best_i), jnp.asarray(best_d)
