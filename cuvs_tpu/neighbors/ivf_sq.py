"""IVF-SQ: inverted file over int8 scalar-quantized vectors.

Reference: ``cuvs::neighbors::ivf_sq``
(/root/reference/cpp/include/cuvs/neighbors/ivf_sq.hpp:36-77,
cpp/src/neighbors/ivf_sq/). Storage is 4x smaller than IVF-Flat; search
math: with the affine dequantization y = a*c + b (same scale for every
dim, trained at quantile=0.99), ``q . y = a (q . c) + b * sum(q)`` — so
the scan computes int8-code dots on the MXU and applies the affine
epilogue, never materializing dequantized vectors.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.cluster import kmeans_balanced
from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import filters as filt
from cuvs_tpu.neighbors import ivf_common as ivf
from cuvs_tpu.preprocessing import quantize as pq
from cuvs_tpu.selection.select_k import select_k, topk


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors ivf_sq::index_params (ivf_sq.hpp:36-62)."""

    n_lists: int = 1024
    metric: DistanceType = DistanceType.L2Expanded
    kmeans_n_iters: int = 20
    kmeans_trainset_fraction: float = 0.5
    quantile: float = 0.99
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))


@dataclasses.dataclass(frozen=True)
class SearchParams:
    n_probes: int = 20
    compute_dtype: object = jnp.float32
    recall_target: object = None


@flax.struct.dataclass
class Index:
    centers: jnp.ndarray
    center_norms: jnp.ndarray
    sorted_codes: jnp.ndarray  # [n + W, d] int8
    sorted_norms: jnp.ndarray  # [n + W] squared norms of DEQUANTIZED rows
    q_min: jnp.ndarray  # dequant offset base
    q_max: jnp.ndarray
    lists: ivf.SortedLists
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)
    window: int = flax.struct.field(pytree_node=False, default=128)
    n_rows: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def n_lists(self):
        return self.centers.shape[0]

    @property
    def size(self):
        return self.n_rows


def build(dataset, params: Optional[IndexParams] = None, **kw) -> Index:
    if params is None:
        params = IndexParams(**kw)
    xf = jnp.asarray(dataset, jnp.float32)
    n = xf.shape[0]
    n_lists = min(params.n_lists, n)
    centers = kmeans_balanced.fit(
        xf,
        n_lists,
        kmeans_balanced.BalancedParams(
            n_clusters=n_lists,
            n_iters=params.kmeans_n_iters,
            trainset_fraction=params.kmeans_trainset_fraction,
            seed=params.seed,
        ),
    )
    labels = kmeans_balanced.predict(xf, centers)
    sq = pq.scalar_train(xf, quantile=params.quantile)
    codes = pq.scalar_transform(sq, xf)
    deq = pq.scalar_inverse_transform(sq, codes)
    norms = pairwise.row_norms(deq)

    window = ivf.round_window(int(jnp.max(jnp.zeros((n_lists,), jnp.int32).at[labels].add(1))))
    order, lists = ivf.sort_by_label(labels, n_lists, pad=window)
    sorted_codes = jnp.concatenate(
        [codes[order], jnp.zeros((window, xf.shape[1]), jnp.int8)], axis=0
    )
    sorted_norms = jnp.pad(norms[order], (0, window))
    return Index(
        centers=centers,
        center_norms=pairwise.row_norms(centers),
        sorted_codes=sorted_codes,
        sorted_norms=sorted_norms,
        q_min=sq.min_,
        q_max=sq.max_,
        lists=lists,
        metric=params.metric,
        window=window,
        n_rows=int(n),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "n_probes", "metric", "window", "compute_dtype", "recall_target")
)
def _search_impl(
    centers, center_norms, sorted_codes, sorted_norms, q_min, q_max, lists,
    queries, prefilter, k, n_probes, metric, window, compute_dtype, recall_target,
):
    nq, d = queries.shape
    qf = jnp.asarray(queries, jnp.float32)
    probe_ids = ivf.coarse_search(qf, centers, center_norms, n_probes, metric)
    ip = metric == DistanceType.InnerProduct
    qnorm = jnp.sum(qf * qf, axis=1)
    qsum = jnp.sum(qf, axis=1)
    qid = jnp.arange(nq, dtype=jnp.int32)

    # dequant: y = a * (c + 128) + q_min  =>  y = a*c + (128a + q_min)
    a = jnp.maximum(q_max - q_min, 1e-30) / 255.0
    b = 128.0 * a + q_min

    def probe_step(carry, j):
        best_v, best_i = carry
        cluster = probe_ids[:, j]
        starts = lists.offsets[cluster]
        codes_w = ivf.window_gather(sorted_codes, starts, window)  # [nq, W, d] i8
        ids_w = ivf.window_gather(lists.ids, starts, window)
        lab_w = ivf.window_gather(lists.labels, starts, window)
        norm_w = ivf.window_gather(sorted_norms, starts, window)

        raw_dots = lax.dot_general(
            qf.astype(compute_dtype)[:, None, :],
            codes_w.astype(compute_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=pairwise.matmul_precision(compute_dtype),
        )[:, 0, :]
        dots = a * raw_dots + b * qsum[:, None]  # q . dequant(c)
        if ip:
            order = -dots
        else:
            order = jnp.maximum(qnorm[:, None] + norm_w - 2.0 * dots, 0.0)

        valid = lab_w == cluster[:, None]
        mask = filt.passes(prefilter, qid[:, None], ids_w)
        if mask is not None:
            valid = jnp.logical_and(valid, mask)
        order = jnp.where(valid, order, jnp.inf)
        tv, tl = topk(order, min(k, window), True, recall_target)
        ti = jnp.take_along_axis(ids_w, tl, axis=1)
        mv = jnp.concatenate([best_v, tv], axis=1)
        mi = jnp.concatenate([best_i, ti], axis=1)
        sv, sidx = lax.top_k(-mv, k)
        return ((-sv), jnp.take_along_axis(mi, sidx, axis=1)), None

    init = (jnp.full((nq, k), jnp.inf, jnp.float32), jnp.zeros((nq, k), jnp.int32))
    (bv, bi), _ = lax.scan(probe_step, init, jnp.arange(n_probes))
    if ip:
        bv = -bv
    return ivf.postprocess_distances(bv, metric), bi


def search(
    index: Index,
    queries,
    k: int,
    params: Optional[SearchParams] = None,
    prefilter: Optional[filt.Prefilter] = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if params is None:
        params = SearchParams(**kw)
    if prefilter is None:
        prefilter = filt.no_filter()
    queries = jnp.asarray(queries)
    return _search_impl(
        index.centers,
        index.center_norms,
        index.sorted_codes,
        index.sorted_norms,
        index.q_min,
        index.q_max,
        index.lists,
        queries,
        prefilter,
        int(k),
        int(min(params.n_probes, index.n_lists)),
        index.metric,
        index.window,
        params.compute_dtype,
        None if params.recall_target is None else float(params.recall_target),
    )
