"""Spectral embedding (Laplacian eigenmaps).

Reference: /root/reference/cpp/include/cuvs/preprocessing/spectral_embedding.hpp
(params{n_components} :28, create_connectivity_graph :203; Lanczos solver
via RAFT).

TPU-native: the connectivity graph is the MXU knn-graph; the smallest
eigenvectors of the normalized Laplacian come from LOBPCG on the shifted
operator 2I - L_norm (largest-eigenpair form), with the sparse matvec
expressed as gather/segment ops — no dense [n, n] matrix is materialized.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuvs_tpu.neighbors import knn_graph as kg


def _sym_knn_edges(x, n_neighbors: int, metric):
    n = x.shape[0]
    k = min(n_neighbors, n - 1)
    nbrs, _ = kg.build_knn_graph(x, k, metric=metric)
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    cols = jnp.asarray(nbrs).reshape(-1)
    # symmetrize: union of (r, c) and (c, r) with weight 1 (connectivity)
    src = jnp.concatenate([rows, cols])
    dst = jnp.concatenate([cols, rows])
    return src, dst


def spectral_embedding(
    x,
    n_components: int = 2,
    n_neighbors: int = 15,
    metric="euclidean",
    n_iters: int = 300,
    seed: int = 0,
    dense_threshold: int = 4096,
) -> jnp.ndarray:
    """Rows -> [n, n_components] Laplacian eigenmap coordinates.

    n <= dense_threshold uses a dense eigh of the normalized Laplacian
    (exact); larger n uses LOBPCG with a sparse gather/segment matvec.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    src, dst = _sym_knn_edges(x, n_neighbors, metric)
    # binary adjacency (dedup multi-edges via max)
    if n <= dense_threshold:
        adj = jnp.zeros((n, n), jnp.float32).at[src, dst].max(1.0)
        adj = jnp.maximum(adj, adj.T)
        deg = jnp.sum(adj, axis=1)
        dinv = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
        lap = jnp.eye(n) - dinv[:, None] * adj * dinv[None, :]
        evals, evecs = jnp.linalg.eigh(lap)  # ascending: smallest first
        emb = evecs[:, 1 : n_components + 1] * dinv[:, None]
    else:
        deg = jnp.zeros((n,), jnp.float32).at[src].add(1.0)
        dinv = 1.0 / jnp.sqrt(jnp.maximum(deg, 1.0))

        def matvec(v):  # (2I - L_norm) v
            scaled = v * dinv[:, None]
            agg = jnp.zeros_like(v).at[src].add(scaled[dst])
            return v + dinv[:, None] * agg

        from jax.experimental.sparse.linalg import lobpcg_standard

        key = jax.random.PRNGKey(seed)
        guess = jax.random.normal(key, (n, n_components + 1), jnp.float32)
        theta, u, _ = lobpcg_standard(matvec, guess, m=n_iters)
        order = jnp.argsort(-theta)
        u = u[:, order]
        emb = u[:, 1 : n_components + 1] * dinv[:, None]
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=0, keepdims=True), 1e-12)
    return emb
