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
import functools
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
    # keep the dataset device-resident: only per-cluster index vectors and
    # per-cluster results cross the host boundary
    dataset = jnp.asarray(dataset)
    if dataset.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        dataset = dataset.astype(jnp.float32)
    n = dataset.shape[0]
    if params.n_clusters <= 1:
        g, d = _single(np.asarray(dataset, np.float32), k, params, **kw)
        return jnp.asarray(g), jnp.asarray(d)

    # batched: balanced cluster, assign each row to overlap_factor clusters.
    # Clusters are PADDED to one uniform size so every per-cluster exact
    # self-search reuses a single compiled program (shape churn would
    # otherwise recompile per cluster) and each [M, d] x [M, d] block runs
    # as full MXU matmuls — this is what makes partitioned exact builds
    # beat gather-bound nn_descent on TPU.
    c = params.n_clusters
    xf = dataset.astype(jnp.float32)
    # train the partitioner on a subsample (reference trains coarse
    # quantizers on trainset_fraction=0.5 or less; c centers need far
    # fewer than n rows, and the full-dataset program is compile-hostile)
    frac = min(1.0, max(200_000, 64 * c) / max(n, 1))
    centers = kmeans_balanced.fit(
        xf, c,
        kmeans_balanced.BalancedParams(
            n_clusters=c, trainset_fraction=frac, seed=params.seed,
        ),
    )
    # overlap_factor nearest clusters per row, selected on device (only the
    # small [n, o] assignment crosses to host for the grouping)
    import jax
    from jax import lax

    @jax.jit
    def _assign(xf, centers):
        d2c = (
            jnp.sum(centers * centers, 1)[None, :]
            - 2.0 * xf @ centers.T
        )
        _, top = lax.top_k(-d2c, params.overlap_factor)
        return top

    assign = np.asarray(_assign(xf, centers))  # [n, o]

    member_lists = [
        np.where((assign == ci).any(axis=1))[0] for ci in range(c)
    ]
    M = max(len(m) for m in member_lists)
    M = -(-M // 128) * 128  # lane-aligned uniform cluster size

    from cuvs_tpu.neighbors import brute_force as bf

    @jax.jit
    def _gather_rows(ds, idx):
        return ds[idx]

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("k_out",))
    def _merge(best_d, best_i, padded, sub_d, sub_l, n_real, k_out):
        g = padded[sub_l]  # local -> global ids [M, kk]
        d = jnp.where(g == padded[:, None], jnp.inf, sub_d)  # drop self
        md = jnp.concatenate([best_d[padded], d], axis=1)
        mi = jnp.concatenate([best_i[padded], g], axis=1)
        # dedup (same neighbor found via two overlapping clusters / pad
        # duplicates): two-key sort by (id, distance) keeps each id's
        # BEST entry first (a stable id-only sort would keep whichever
        # column came first — e.g. an inf placeholder), inf out repeats,
        # re-sort by distance
        mi_s, md_s = jax.lax.sort((mi, md), dimension=1, num_keys=2)
        dup = jnp.concatenate(
            [jnp.zeros((mi.shape[0], 1), bool), mi_s[:, 1:] == mi_s[:, :-1]], axis=1
        )
        md_s = jnp.where(dup, jnp.inf, md_s)
        sv, si = jax.lax.sort((md_s, mi_s), dimension=1, num_keys=1)
        rows = jnp.arange(padded.shape[0], dtype=jnp.int32)
        target = jnp.where(rows < n_real, padded, best_d.shape[0])  # pads drop
        best_d = best_d.at[target].set(sv[:, :k_out], mode="drop")
        best_i = best_i.at[target].set(si[:, :k_out], mode="drop")
        return best_d, best_i

    best_d = jnp.full((n, k), jnp.inf, jnp.float32)
    best_i = jnp.full((n, k), -1, jnp.int32)  # -1 = empty slot, never a row id
    compute_dtype = kw.pop("compute_dtype", jnp.float32)
    recall_target = kw.pop("recall_target", None)
    for ci in range(c):
        members = member_lists[ci]
        if len(members) <= k:
            continue
        n_real = len(members)
        padded = jnp.asarray(
            np.concatenate(
                [members, np.full(M - n_real, members[0], members.dtype)]
            ).astype(np.int32)
        )
        sub = _gather_rows(dataset, padded)  # device-side gather
        index = bf.build(sub, metric=params.metric)
        sub_d, sub_l = bf.search(
            index, sub, min(k + 1, M), compute_dtype=compute_dtype,
            recall_target=recall_target,
        )
        best_d, best_i = _merge(
            best_d, best_i, padded, sub_d, jnp.asarray(sub_l, jnp.int32),
            jnp.int32(n_real), k,
        )
    # a row whose list came up short keeps -1/inf slots (e.g. its clusters
    # were skipped for having <= k members); pad ids with the row's own
    # first neighbor — or the next row as a last resort — so consumers
    # always see valid non-self ids (distances stay +inf)
    rows = jnp.arange(n, dtype=jnp.int32)
    first = jnp.where(best_i[:, 0] >= 0, best_i[:, 0], (rows + 1) % n)
    best_i = jnp.where(best_i >= 0, best_i, first[:, None])
    return best_i, best_d
