"""Spectral clustering: Laplacian eigenmap embedding + k-means.

Reference: cpp/src/cluster/detail/spectral.cuh:38-55
(/root/reference/cpp/src/cluster/spectral.cu).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cuvs_tpu.cluster import kmeans
from cuvs_tpu.preprocessing.spectral import spectral_embedding


def fit_predict(
    x,
    n_clusters: int,
    n_components: int = None,
    n_neighbors: int = 15,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (labels [n], embedding [n, n_components])."""
    if n_components is None:
        n_components = n_clusters
    emb = spectral_embedding(
        x, n_components=n_components, n_neighbors=n_neighbors, seed=seed
    )
    centers, labels, _, _ = kmeans.fit(emb, n_clusters=n_clusters, seed=seed)
    return labels, emb
