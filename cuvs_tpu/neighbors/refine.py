"""Exact re-ranking of candidate neighbor lists.

Reference: ``cuvs::neighbors::refine``
(/root/reference/cpp/include/cuvs/neighbors/refine.hpp:62-377; device path
cpp/src/neighbors/refine/refine_device.cuh builds a throwaway one-list-per-
query IVF and reuses the interleaved scan).

TPU-native: a candidate list is just a gather — [nq, c, d] candidate
vectors batched-dotted with the queries, then top-k. One jitted program,
no throwaway index needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import ivf_common as ivf


@functools.partial(jax.jit, static_argnames=("k", "metric", "compute_dtype", "qchunk"))
def _refine_impl(dataset, queries, candidates, k, metric, compute_dtype, qchunk):
    nq, c = candidates.shape
    n, d = dataset.shape
    ip = metric == DistanceType.InnerProduct

    pad = (-nq) % qchunk
    qp = jnp.pad(jnp.asarray(queries, jnp.float32), ((0, pad), (0, 0)))
    cp = jnp.pad(candidates, ((0, pad), (0, 0)), constant_values=-1)

    def chunk_fn(args):
        q, cand = args
        invalid = cand < 0
        safe = jnp.clip(cand, 0, n - 1)
        vecs = dataset[safe].astype(jnp.float32)  # [B, c, d]
        dots = lax.dot_general(
            q.astype(compute_dtype)[:, None, :],
            vecs.astype(compute_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=pairwise.matmul_precision(compute_dtype),
        )[:, 0, :]
        if ip:
            order = -dots
        elif metric == DistanceType.CosineExpanded:
            qn = jnp.sqrt(jnp.sum(q * q, 1))[:, None]
            vn = jnp.sqrt(jnp.sum(vecs * vecs, 2))
            order = 1.0 - dots / jnp.maximum(qn * vn, 1e-30)
        else:
            qn = jnp.sum(q * q, 1)[:, None]
            vn = jnp.sum(vecs * vecs, 2)
            order = jnp.maximum(qn + vn - 2.0 * dots, 0.0)
        order = jnp.where(invalid, jnp.inf, order)
        tv, tl = lax.top_k(-order, k)
        ti = jnp.take_along_axis(safe, tl, axis=1)
        return -tv, ti.astype(candidates.dtype)

    bv, bi = lax.map(chunk_fn, (qp.reshape(-1, qchunk, d), cp.reshape(-1, qchunk, c)))
    bv = bv.reshape(-1, k)[:nq]
    bi = bi.reshape(-1, k)[:nq]
    if ip:
        bv = -bv
    return ivf.postprocess_distances(bv, metric), bi


def refine(
    dataset,
    queries,
    candidates,
    k: int,
    metric="sqeuclidean",
    compute_dtype=jnp.float32,
    query_chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-rank ``candidates`` [nq, c] (global ids; negative = invalid) by the
    exact metric; returns the best k. Parity: refine.hpp:62."""
    metric = normalize_metric(metric)
    dataset = jnp.asarray(dataset)
    queries = jnp.asarray(queries)
    candidates = jnp.asarray(candidates)
    if k > candidates.shape[1]:
        raise ValueError(f"k={k} > candidate count {candidates.shape[1]}")
    qchunk = int(min(query_chunk, max(8, queries.shape[0])))
    return _refine_impl(dataset, queries, candidates, int(k), metric, compute_dtype, qchunk)
