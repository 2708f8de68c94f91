"""k-means clustering (Lloyd) with k-means++ initialization.

Reference surface: ``cuvs::cluster::kmeans::{fit,predict,fit_predict,
transform,cluster_cost}`` with params n_clusters=8, max_iter=300, tol=1e-4,
init KMeansPlusPlus/Random/Array
(/root/reference/cpp/include/cuvs/cluster/kmeans.hpp:37-125; impl
cpp/src/cluster/kmeans_impl.cuh).

TPU-native: assignment is the fused MXU matmul + argmin
(distance.fused_l2_argmin); the center update is one ``segment_sum``. The
Lloyd loop is a jitted ``lax.while_loop`` with inertia-based tolerance —
the whole fit compiles to a single XLA program, no host round-trips per
iteration.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance.fused_l2_nn import fused_l2_argmin
from cuvs_tpu.distance.pairwise import (
    DistanceType,
    matmul_precision,
    normalize_metric,
    pairwise_distance,
)


@dataclasses.dataclass(frozen=True)
class KMeansParams:
    """Mirrors cuvs::cluster::kmeans::params defaults (kmeans.hpp:37-125)."""

    n_clusters: int = 8
    max_iter: int = 300
    tol: float = 1e-4
    init: str = "kmeans++"  # "kmeans++" | "random" | "array"
    seed: int = 0
    metric: DistanceType = DistanceType.L2Expanded
    batch_samples: int = 1 << 15


def _assign(x, centers, compute_dtype=jnp.float32):
    labels, dists = fused_l2_argmin(x, centers, compute_dtype=compute_dtype)
    return labels, dists


def _update_centers(x, labels, weights, n_clusters, old_centers):
    w = weights[:, None]
    sums = jax.ops.segment_sum(x * w, labels, num_segments=n_clusters)
    counts = jax.ops.segment_sum(weights, labels, num_segments=n_clusters)
    new = sums / jnp.maximum(counts, 1e-12)[:, None]
    # empty clusters keep their previous center (relocation is handled by
    # kmeans++ init quality; balanced kmeans has its own adjustment).
    return jnp.where(counts[:, None] > 0, new, old_centers), counts


def _kmeans_pp_init(key, x, n_clusters, n_candidates=None):
    """k-means++ seeding (greedy variant over minimum distances)."""
    n = x.shape[0]
    k0 = jax.random.randint(key, (), 0, n)
    first = x[k0]

    def body(carry, key_i):
        centers, min_d = carry
        # sample next center proportional to min squared distance
        logits = jnp.log(jnp.maximum(min_d, 1e-30))
        idx = jax.random.categorical(key_i, logits)
        c = x[idx]
        d = jnp.sum((x - c[None, :]) ** 2, axis=1)
        new_min = jnp.minimum(min_d, d)
        return (centers, new_min), c

    d0 = jnp.sum((x - first[None, :]) ** 2, axis=1)
    keys = jax.random.split(key, n_clusters - 1)
    (_, _), rest = lax.scan(body, (None, d0), keys)
    return jnp.concatenate([first[None], rest], axis=0)


@functools.partial(jax.jit, static_argnames=("n_clusters", "max_iter", "init", "tol"))
def _fit_impl(key, x, weights, init_centers, n_clusters, max_iter, init, tol):
    n, d = x.shape
    if init == "array":
        centers0 = init_centers
    elif init == "random":
        idx = jax.random.choice(key, n, (n_clusters,), replace=False)
        centers0 = x[idx]
    else:
        centers0 = _kmeans_pp_init(key, x, n_clusters)

    def cond(state):
        centers, prev_inertia, inertia, it = state
        rel = jnp.abs(prev_inertia - inertia) / jnp.maximum(prev_inertia, 1e-30)
        return jnp.logical_and(it < max_iter, jnp.logical_or(it < 2, rel > tol))

    def body(state):
        centers, _, inertia, it = state
        labels, dists = _assign(x, centers)
        new_centers, _ = _update_centers(x, labels, weights, n_clusters, centers)
        new_inertia = jnp.sum(dists * weights)
        return new_centers, inertia, new_inertia, it + 1

    init_state = (centers0, jnp.float32(jnp.inf), jnp.float32(jnp.inf), 0)
    centers, _, inertia, n_iter = lax.while_loop(cond, body, init_state)
    labels, dists = _assign(x, centers)
    inertia = jnp.sum(dists * weights)
    return centers, labels, inertia, n_iter


def fit(
    x,
    params: Optional[KMeansParams] = None,
    n_clusters: Optional[int] = None,
    sample_weights=None,
    init_centers=None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means. Returns (centers [k,d], labels [n], inertia, n_iter)."""
    if params is None:
        params = KMeansParams(n_clusters=n_clusters or 8, **kw)
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    w = (
        jnp.ones((n,), jnp.float32)
        if sample_weights is None
        else jnp.asarray(sample_weights, jnp.float32)
    )
    key = jax.random.PRNGKey(params.seed)
    init = params.init if init_centers is None else "array"
    ic = (
        jnp.zeros((params.n_clusters, x.shape[1]), jnp.float32)
        if init_centers is None
        else jnp.asarray(init_centers, jnp.float32)
    )
    return _fit_impl(key, x, w, ic, params.n_clusters, params.max_iter, init, params.tol)


def predict(x, centers) -> jnp.ndarray:
    """Nearest-center labels."""
    labels, _ = _assign(jnp.asarray(x, jnp.float32), jnp.asarray(centers, jnp.float32))
    return labels


def fit_predict(x, params: Optional[KMeansParams] = None, **kw):
    centers, labels, inertia, n_iter = fit(x, params, **kw)
    return labels, centers


def transform(x, centers) -> jnp.ndarray:
    """Distances from each sample to each cluster center [n, k]."""
    return pairwise_distance(x, centers, metric=DistanceType.L2SqrtExpanded)


def cluster_cost(x, centers) -> jnp.ndarray:
    """Sum of squared distances to the closest center (inertia)."""
    _, dists = _assign(jnp.asarray(x, jnp.float32), jnp.asarray(centers, jnp.float32))
    return jnp.sum(dists)


def find_k(
    x, kmax: int, kmin: int = 1, max_iter: int = 100, tol: float = 1e-3, seed: int = 0
) -> Tuple[int, jnp.ndarray, jnp.ndarray]:
    """Binary-search the optimal k by inertia elbow.

    Parity: cuvs auto-find-k
    (/root/reference/cpp/src/cluster/detail/kmeans_auto_find_k.cuh).
    Returns (best_k, centers, inertia).
    """
    import numpy as np

    def cost(k):
        centers, _, inertia, _ = fit(
            x, KMeansParams(n_clusters=int(k), max_iter=max_iter, seed=seed)
        )
        return float(inertia), centers

    lo, hi = kmin, kmax
    best = None
    c_lo, cent_lo = cost(lo)
    c_hi, cent_hi = cost(hi)
    best = (hi, cent_hi, c_hi)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        c_mid, cent_mid = cost(mid)
        # relative improvement from mid to hi; if small, mid is enough
        if (c_mid - c_hi) / max(c_mid, 1e-30) < tol:
            hi, c_hi, cent_hi = mid, c_mid, cent_mid
            best = (mid, cent_mid, c_mid)
        else:
            lo, c_lo = mid, c_mid
    return best[0], best[1], jnp.float32(best[2])
