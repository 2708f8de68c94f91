"""Clustering / embedding quality statistics.

Reference: /root/reference/cpp/include/cuvs/stats/silhouette_score.hpp
(incl. batched variant) and trustworthiness_score.hpp
(cpp/src/stats/, 992 LoC).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cuvs_tpu.distance.pairwise import pairwise_distance


def silhouette_score(
    x, labels, n_clusters: int = None, metric="euclidean", chunk: int = 2048
) -> jnp.ndarray:
    """Mean silhouette coefficient over all samples.

    s(i) = (b_i - a_i) / max(a_i, b_i), a = mean intra-cluster distance,
    b = min over other clusters of mean distance to that cluster.
    Computed in row chunks (the "batched" variant of the reference).
    """
    x = jnp.asarray(x, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    n = x.shape[0]
    if n_clusters is None:
        n_clusters = int(jnp.max(labels)) + 1
    counts = jnp.zeros((n_clusters,), jnp.float32).at[labels].add(1.0)

    sil_sum = jnp.float32(0.0)
    for s in range(0, n, chunk):
        xc = x[s : s + chunk]
        lc = labels[s : s + chunk]
        d = pairwise_distance(xc, x, metric=metric)  # [c, n]
        onehot = jax.nn.one_hot(labels, n_clusters, dtype=jnp.float32)  # [n, k]
        per_cluster_sum = d @ onehot  # [c, k]
        own = counts[lc]
        a = jnp.take_along_axis(per_cluster_sum, lc[:, None], axis=1)[:, 0] / jnp.maximum(
            own - 1.0, 1.0
        )
        mean_to = per_cluster_sum / jnp.maximum(counts[None, :], 1.0)
        mean_to = mean_to.at[jnp.arange(xc.shape[0]), lc].set(jnp.inf)
        b = jnp.min(mean_to, axis=1)
        s_i = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-30)
        s_i = jnp.where(own > 1, s_i, 0.0)  # singleton clusters score 0
        sil_sum = sil_sum + jnp.sum(s_i)
    return sil_sum / n


def trustworthiness_score(
    x, x_embedded, n_neighbors: int = 5, metric="sqeuclidean"
) -> jnp.ndarray:
    """How much an embedding preserves local structure (in [0, 1]).

    T = 1 - 2/(n*k*(2n - 3k - 1)) * sum_i sum_{j in kNN_emb(i) \\ kNN_orig(i)}
        (rank_orig(i, j) - k)
    """
    x = jnp.asarray(x, jnp.float32)
    e = jnp.asarray(x_embedded, jnp.float32)
    n = x.shape[0]
    k = n_neighbors
    d_orig = pairwise_distance(x, x, metric=metric)
    d_emb = pairwise_distance(e, e, metric=metric)
    big = jnp.float32(jnp.inf)
    d_orig = d_orig.at[jnp.arange(n), jnp.arange(n)].set(big)
    d_emb = d_emb.at[jnp.arange(n), jnp.arange(n)].set(big)
    # rank of j in i's original ordering (0-based over non-self)
    order_orig = jnp.argsort(d_orig, axis=1)
    ranks = jnp.zeros((n, n), jnp.int32)
    ranks = ranks.at[jnp.arange(n)[:, None], order_orig].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    )
    emb_knn = jnp.argsort(d_emb, axis=1)[:, :k]
    r = jnp.take_along_axis(ranks, emb_knn, axis=1)  # [n, k]
    penalty = jnp.sum(jnp.maximum(r - k + 1, 0).astype(jnp.float32))
    denom = n * k * (2.0 * n - 3.0 * k - 1.0)
    return 1.0 - (2.0 / denom) * penalty
