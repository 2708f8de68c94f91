"""Balanced hierarchical k-means — the IVF coarse-quantizer trainer.

Reference: ``cuvs::cluster::kmeans_balanced``
(/root/reference/cpp/src/cluster/detail/kmeans_balanced.cuh): train on a
subsample, mesocluster EM over ~sqrt(k) groups, per-mesocluster fine
clusters sized proportionally (:784-810), then global balancing EM
iterations with adaptive center adjustment (:645, :725-767). Balance
matters because IVF lists are padded to the max list size on TPU — a
balanced quantizer directly bounds padding waste.

TPU-native: every phase is a jitted fused-argmin + segment_sum program.
The per-mesocluster fine init avoids dynamic shapes by sorting trainset
rows by mesocluster label and picking evenly strided rows per group — a
static gather. The balancing step multiplies cluster distances by a
size-dependent penalty inside the assignment (soft balancing) and
teleports undersized centers onto points of oversized clusters.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance.fused_l2_nn import fused_l2_argmin


@dataclasses.dataclass(frozen=True)
class BalancedParams:
    """Mirrors cuvs::cluster::kmeans::balanced_params (kmeans.hpp:159)."""

    n_clusters: int = 1024
    n_iters: int = 20
    balancing_em_iters: int = 5
    trainset_fraction: float = 1.0
    seed: int = 0
    compute_dtype: object = jnp.float32


def _em_iters(x, centers, n_iters, compute_dtype):
    """Plain EM: assign + mean update; empty clusters keep old centers."""
    k = centers.shape[0]

    def step(centers, _):
        labels, _ = fused_l2_argmin(x, centers, compute_dtype=compute_dtype)
        sums = jax.ops.segment_sum(x, labels, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones_like(labels, jnp.float32), labels, k)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers), None

    centers, _ = lax.scan(step, centers, None, length=n_iters)
    return centers


def _balancing_iters(key, x, centers, n_iters, compute_dtype):
    """EM with soft balancing + adaptive center adjustment.

    Mirrors kmeans_balanced.cuh:645-810 (balancing_em_iters +
    adjust_centers) with both of its levers:
      * SOFT: the assignment argmin multiplies each cluster's squared
        distance by a size-dependent penalty ``(count/avg)^0.5`` — points
        near a heavy cluster's boundary drain to lighter neighbors, which
        directly bounds the padded scan window (peak HBM + scan cost);
      * HARD: clusters still under ``avg/4`` members are teleported onto
        a random member of an oversized cluster.
    The FINAL iteration runs with the true (unweighted) metric so the
    returned centers assign points honestly at predict() time.
    """
    n = x.shape[0]
    k = centers.shape[0]
    avg = n / k

    def step(carry, args):
        centers = carry
        key_i, last = args
        labels0, _ = fused_l2_argmin(x, centers, compute_dtype=compute_dtype)
        counts0 = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), labels0, k)
        # only OVERSIZED clusters are penalized (clamped at 1): boosting
        # undersized ones would attract far points and cost recall at
        # fixed n_probes — measured on the cosine recall suite
        penalty = jnp.sqrt(jnp.maximum(counts0 / avg, 1.0))
        penalty = jnp.where(last, jnp.ones_like(penalty), penalty)
        labels, _ = fused_l2_argmin(
            x, centers, compute_dtype=compute_dtype, center_weights=penalty
        )
        sums = jax.ops.segment_sum(x, labels, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones_like(labels, jnp.float32), labels, k)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        new = jnp.where(counts[:, None] > 0, new, centers)
        # teleport small clusters onto members of probabilistically-sampled
        # big clusters (points are sampled ∝ their cluster's size)
        small = counts < (avg * 0.25)
        point_weight = counts[labels]  # big-cluster points more likely
        donor_idx = jax.random.categorical(
            key_i, jnp.log(jnp.maximum(point_weight, 1e-9)), shape=(k,)
        )
        donors = x[donor_idx]
        new = jnp.where(jnp.logical_and(small, ~last)[:, None], donors, new)
        return new, None

    keys = jax.random.split(key, n_iters)
    last = jnp.arange(n_iters) == n_iters - 1
    centers, _ = lax.scan(step, centers, (keys, last))
    return centers


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "n_meso", "n_iters", "bal_iters", "compute_dtype")
)
def _fit_impl(key, x, n_clusters, n_meso, n_iters, bal_iters, compute_dtype):
    n, d = x.shape
    k_meso, k_bal, k_init = jax.random.split(key, 3)

    # 1) mesocluster EM over ~sqrt(k) groups
    meso_idx = jax.random.choice(k_init, n, (n_meso,), replace=False)
    meso_centers = _em_iters(x, x[meso_idx], max(2, n_iters // 2), compute_dtype)
    meso_labels, _ = fused_l2_argmin(x, meso_centers, compute_dtype=compute_dtype)

    # 2) allocate fine clusters per mesocluster ∝ size; init fine centers by
    #    evenly strided picks from rows sorted by mesocluster label.
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), meso_labels, n_meso)
    alloc_f = counts / n * n_clusters
    alloc = jnp.maximum(jnp.floor(alloc_f), 1.0).astype(jnp.int32)
    # fix rounding so sum(alloc) == n_clusters: distribute remainder to
    # largest fractional parts (approximate: add to biggest clusters)
    deficit = n_clusters - jnp.sum(alloc)
    order = jnp.argsort(-(alloc_f - jnp.floor(alloc_f)))
    bump_sign = jnp.where(deficit >= 0, 1, -1)
    n_bump = jnp.abs(deficit)
    rank_of = jnp.zeros((n_meso,), jnp.int32).at[order].set(jnp.arange(n_meso, dtype=jnp.int32))
    bump = jnp.where(rank_of < n_bump, bump_sign, 0)
    alloc = jnp.maximum(alloc + bump, 1)
    # renormalize defensively (sum may still drift by a couple when many
    # clusters clamp at 1; final EM does not care about a tiny mismatch,
    # but the center count must be exactly n_clusters)
    meso_offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(alloc)[:-1]])

    sort_order = jnp.argsort(meso_labels)
    sorted_x = x[sort_order]
    point_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts.astype(jnp.int32))[:-1]]
    )

    # fine center j belongs to mesocluster m(j); pick the (t+0.5)/alloc_m
    # quantile row of that mesocluster's sorted block.
    fine_ids = jnp.arange(n_clusters, dtype=jnp.int32)
    meso_of_fine = jnp.searchsorted(jnp.cumsum(alloc), fine_ids, side="right").astype(jnp.int32)
    meso_of_fine = jnp.minimum(meso_of_fine, n_meso - 1)
    t = fine_ids - meso_offsets[meso_of_fine]
    block_size = counts.astype(jnp.int32)[meso_of_fine]
    pick = point_offsets[meso_of_fine] + jnp.minimum(
        ((t.astype(jnp.float32) + 0.5) / alloc.astype(jnp.float32)[meso_of_fine] * block_size)
        .astype(jnp.int32),
        jnp.maximum(block_size - 1, 0),
    )
    fine_centers = sorted_x[jnp.minimum(pick, n - 1)]

    # 3) fine EM + balancing
    fine_centers = _em_iters(x, fine_centers, n_iters, compute_dtype)
    fine_centers = _balancing_iters(k_bal, x, fine_centers, bal_iters, compute_dtype)
    return fine_centers


def fit(
    x,
    n_clusters: int,
    params: Optional[BalancedParams] = None,
    **kw,
) -> jnp.ndarray:
    """Train a balanced coarse quantizer. Returns centers [n_clusters, d]."""
    if params is None:
        params = BalancedParams(n_clusters=n_clusters, **kw)
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    key = jax.random.PRNGKey(params.seed)
    if params.trainset_fraction < 1.0:
        m = max(n_clusters * 4, int(n * params.trainset_fraction))
        m = min(n, m)
        sub_key, key = jax.random.split(key)
        idx = jax.random.choice(sub_key, n, (m,), replace=False)
        x = x[idx]
    n_meso = max(1, int(math.ceil(math.sqrt(n_clusters))))
    if n_clusters >= x.shape[0]:
        # degenerate: more clusters than points — pad with repeated points
        reps = -(-n_clusters // x.shape[0])
        return jnp.tile(x, (reps, 1))[:n_clusters]
    return _fit_impl(
        key,
        x,
        int(n_clusters),
        int(n_meso),
        int(params.n_iters),
        int(params.balancing_em_iters),
        params.compute_dtype,
    )


def predict(x, centers, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Batched nearest-center assignment over the full dataset."""
    labels, _ = fused_l2_argmin(
        jnp.asarray(x, jnp.float32), jnp.asarray(centers, jnp.float32),
        compute_dtype=compute_dtype,
    )
    return labels


def fit_predict(x, n_clusters: int, params: Optional[BalancedParams] = None, **kw):
    centers = fit(x, n_clusters, params, **kw)
    return predict(x, centers), centers
