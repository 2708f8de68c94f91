"""Dense epsilon-neighborhood: boolean within-radius adjacency.

Reference: /root/reference/cpp/include/cuvs/neighbors/epsilon_neighborhood.hpp
(cpp/src/neighbors/detail/epsilon_neighborhood.cuh): adjacency [m, n] +
per-row vertex degree, for L2SqrtUnexpanded.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cuvs_tpu.distance.pairwise import pairwise_distance


def eps_neighbors(
    x, y, eps: float, metric="euclidean", row_tile: int = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (adjacency [m, n] bool, degree [m] int32): d(x_i, y_j) <= eps."""
    d = pairwise_distance(x, y, metric=metric, row_tile=row_tile)
    adj = d <= eps
    return adj, jnp.sum(adj, axis=1).astype(jnp.int32)
